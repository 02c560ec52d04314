"""Build the --py-files artifact for cluster deploys:

    python tools/package.py          # → dist/crawleria_spark.zip
    spark-submit --py-files dist/crawleria_spark.zip your_job.py
"""

from __future__ import annotations

import os
import zipfile


def build(out: str = "dist/crawleria_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "crawleria_spark")
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out_path = os.path.join(root, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    print(build())
