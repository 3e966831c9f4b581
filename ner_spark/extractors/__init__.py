from .casen import rule_mentions  # noqa: F401
from .model_stub import model_mentions  # noqa: F401
