"""Build the spark-submit --py-files artifact: hgt2osm2_spark.zip.

The package is pure Python (+NumPy/Arrow at runtime), so the zip is
directly zipimport-able on executors:

    spark-submit --py-files dist/hgt2osm2_spark.zip your_job.py

Deterministic output: entries are sorted and timestamps zeroed, so the
artifact hash is stable for cache-keyed deploys.

Usage: python tools/make_pyfiles.py [out_dir]   (default: dist/)
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str = "dist") -> str:
    os.makedirs(os.path.join(ROOT, out_dir), exist_ok=True)
    out = os.path.join(ROOT, out_dir, "hgt2osm2_spark.zip")
    pkg = os.path.join(ROOT, "hgt2osm2_spark")
    entries = []
    for dirpath, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, ROOT), full))
    entries.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "dist")
    print(path)
