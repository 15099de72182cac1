"""Package the engine for cluster submission: builds
``dist/yirgacheffe_spark.zip`` suitable for ``spark-submit --py-files``.

The package is pure Python (numpy/pandas/pyarrow come from the executors'
environment, as on any PySpark cluster), so a source zip is the whole
deployment artifact:

    python scripts/make_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/yirgacheffe_spark.zip \
        scripts/submit_main.py curate \
        --input s3://bucket/crawl/documents/ --output s3://bucket/curated/
"""
from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "yirgacheffe_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(ROOT, "yirgacheffe_spark")
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
                n += 1
    print(f"{out_path}: {n} modules")
    return out_path


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else None)
