from .text import (  # noqa: F401
    context_window,
    label_from_map,
    method_weight,
    normalize_surface,
    normalize_ws,
)
