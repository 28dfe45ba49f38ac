"""Build dist/sat_val_framework_spark.zip for spark-submit --py-files, and a
thin run_validation.py driver script next to it."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "sat_val_framework_spark")
DIST = os.path.join(REPO, "dist")

DRIVER = '''\
"""Thin spark-submit driver: spark-submit --py-files sat_val_framework_spark.zip run_validation.py ..."""
import sys
from sat_val_framework_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
'''


def build() -> str:
    os.makedirs(DIST, exist_ok=True)
    zpath = os.path.join(DIST, "sat_val_framework_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    with open(os.path.join(DIST, "run_validation.py"), "w") as f:
        f.write(DRIVER)
    return zpath


if __name__ == "__main__":
    print(build())
