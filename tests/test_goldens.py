"""Golden freshness guard: regenerating the cheap scalar-twin goldens
must reproduce the committed files byte-for-byte — a semantic change to
kernels/sketches/seeds that silently invalidates goldens fails HERE at
pytest time instead of at the driver gate."""

import os

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _regen_and_compare(names):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(ROOT, "tools", "make_golden.py")
    )
    mg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mg)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        mg.GOLDEN_DIR = tmp
        for name in names:
            mg.GENERATORS[name]()
            fresh = pq.read_table(os.path.join(tmp, f"{name}.parquet"))
            committed = pq.read_table(os.path.join(ROOT, "golden", f"{name}.parquet"))
            assert fresh.equals(committed), f"golden {name} is STALE — rerun tools/make_golden.py"


def test_cheap_goldens_are_fresh():
    # pure scalar twins, no Spark, < 10 s total; contour_metrics chains
    # the full scalar pipeline so kernel changes are caught too
    _regen_and_compare(
        ["crop_stats", "decode_stats", "show_areas", "frame_sample",
         "multimodal_resize", "hgt_zip_scan", "contour_metrics"]
    )
