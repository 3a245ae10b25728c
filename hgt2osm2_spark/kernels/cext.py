"""Shared lazy gcc build/load for the optional C kernel fast paths.

See kernels/stitch_cext.py for the design contract (lazy first-use
build, content-hashed cache, pure-Python fallback + oracle, disabled
via HGT2OSM2_NO_CKERNEL).  The flags matter for bit-exactness:
``-ffp-contract=off`` forbids FMA contraction so every double op in the
C twins matches the Python/NumPy IEEE-754 sequence exactly; no
-ffast-math, ever.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile


def build_lib(name: str, source: str) -> ctypes.CDLL:
    """Compile `source` (cached by content hash) and load it."""
    digest = hashlib.md5(source.encode()).hexdigest()[:16]
    cache_dir = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    so_dir = os.path.join(cache_dir, "hgt2osm2_spark")
    so_path = os.path.join(so_dir, f"{name}_{digest}.so")
    if not os.path.exists(so_path):
        os.makedirs(so_dir, exist_ok=True)
        # build INSIDE so_dir so the final os.replace is a same-filesystem
        # atomic rename (a /tmp tempdir raises EXDEV on tmpfs hosts, which
        # available() would swallow and silently disable every C path)
        with tempfile.TemporaryDirectory(dir=so_dir) as td:
            src = os.path.join(td, f"{name}.c")
            with open(src, "w") as f:
                f.write(source)
            tmp_so = os.path.join(td, f"{name}.so")
            subprocess.run(
                ["gcc", "-O2", "-ffp-contract=off", "-fPIC", "-shared",
                 "-o", tmp_so, src],
                check=True, capture_output=True, timeout=120,
            )
            # atomic publish — concurrent executor workers race benignly
            os.replace(tmp_so, so_path)
    return ctypes.CDLL(so_path)


def disabled() -> bool:
    return bool(os.environ.get("HGT2OSM2_NO_CKERNEL"))
