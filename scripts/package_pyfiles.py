#!/usr/bin/env python
"""Build dist/py_evalfilter_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    os.makedirs(f"{REPO}/dist", exist_ok=True)
    zip_path = f"{REPO}/dist/py_evalfilter_spark.zip"
    pkg = f"{REPO}/py_evalfilter_spark"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    print(zip_path)
    return zip_path


if __name__ == "__main__":
    main()
