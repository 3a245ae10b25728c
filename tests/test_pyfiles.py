"""The spark-submit --py-files artifact must actually work: build the
zip, then import and RUN a kernel from it in a clean subprocess whose
sys.path contains the zip instead of the repo (exactly what an executor
does with a --py-files archive)."""

import subprocess
import sys
import tempfile

from tools.make_pyfiles import build


def test_zip_is_importable_and_runs_a_kernel():
    out = build(tempfile.mkdtemp(prefix="pyfiles_"))
    probe = f"""
import sys
sys.path = [p for p in sys.path if 'repo' not in p]
sys.path.insert(0, {out!r})
import hgt2osm2_spark
assert 'hgt2osm2_spark.zip' in hgt2osm2_spark.__file__, hgt2osm2_spark.__file__
import numpy as np
from hgt2osm2_spark.kernels import codecs, gif, marching
from hgt2osm2_spark.kernels.fixtures import TEST1
# run a real kernel path end-to-end from the zip
segs = marching.extract_segments(TEST1, 20, -0.5)
assert len(segs) == 28
img = np.full((8, 8, 3), 99, np.uint8)
assert (gif.decode_gif_rgb8(gif.encode_gif_rgb8(img)) == gif.websafe_quantize(img)).all()
print('ZIPIMPORT_OK')
"""
    res = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True, timeout=120
    )
    assert res.returncode == 0, res.stderr
    assert "ZIPIMPORT_OK" in res.stdout
