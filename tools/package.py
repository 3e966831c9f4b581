"""Build kg.zip for spark-submit --py-files (north_rule deployment shape).

    python tools/package.py          # writes dist/kg.zip
    spark-submit --py-files dist/kg.zip run_pipeline.py --n-docs ... --out ...
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "kg.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for base, _dirs, files in os.walk(os.path.join(ROOT, "ner_spark")):
            if "__pycache__" in base:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    path = os.path.join(base, fn)
                    z.write(path, os.path.relpath(path, ROOT))
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
