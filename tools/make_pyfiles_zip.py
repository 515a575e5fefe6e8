"""Package mimic_spark/ into a --py-files zip for spark-submit.

    python tools/make_pyfiles_zip.py [out.zip]          # default: dist/mimic_spark.zip
    spark-submit --master <cluster> --py-files dist/mimic_spark.zip \
        mimic_spark/job.py --set n_events=10000000000 --set mode=stream

The zip contains the package only (no tests/tools); executors import it from
the distributed archive, the driver runs job.py directly.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_path: str = "dist/mimic_spark.zip", repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "mimic_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, root)
                zf.write(full, arc)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/mimic_spark.zip"
    print(build(out))
