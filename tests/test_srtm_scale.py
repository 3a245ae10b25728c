"""SRTM-1 native-grain stress (VERDICT r2 item 8): one 3601x3601 tile
— the reference's big HGT case (HGTReader.cs:49-50) — end-to-end
through the fused contour path, with the memory envelope asserted.

Slow (~1 min): marked `slow`; deselect with `-m "not slow"` when
iterating. tools/srtm_stress.py writes the BENCH/SRTM1.md note.
"""

from __future__ import annotations

import pytest


@pytest.mark.slow
def test_srtm1_tile_end_to_end(spark):
    from hgt2osm2_spark.config import ContourOptions
    from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
    from hgt2osm2_spark.sources import synthetic

    n = 3601
    # VmHWM is process-lifetime peak; in a shared test session the JVM
    # has already peaked on earlier suites. Reset the high-water mark
    # (write "5" to clear_refs) so the assertion measures THIS tile.
    pid = spark._jvm.java.lang.ProcessHandle.current().pid()
    with open(f"/proc/{pid}/clear_refs", "w") as f:
        f.write("5")

    def _status_kib(field):
        with open(f"/proc/{pid}/status") as f:
            return next(
                int(line.split()[1]) for line in f if line.startswith(field)
            )

    # clear_refs resets VmHWM to *current* RSS, and a shared test-session
    # JVM never returns heap from earlier suites — so the envelope must
    # be the INCREMENT this tile adds, not the absolute peak (which is
    # test-order-dependent).
    base_kib = _status_kib("VmHWM")

    tiles = synthetic.tiles_df(spark, n_tiles=1, size=n, partitions=1)
    res = run_contour_pipeline(
        tiles, ContourOptions(minor_distance=100), shuffle_partitions=8
    )
    n_nodes = res.nodes.count()
    n_ways = res.ways.count()
    assert n_nodes > 10_000 and n_ways > 50  # real contour volume came out

    # node ids are tile-keyed and strictly consistent with the ways
    from pyspark.sql import functions as F

    ref_total = res.ways.agg(F.sum(F.size("node_refs"))).collect()[0][0]
    assert ref_total >= n_nodes  # closed rings re-reference their first node

    # memory envelope: the single task that held the whole 13M-sample
    # tile must fit far under the driver cap (per-task sizing evidence)
    hwm_kib = _status_kib("VmHWM")
    delta_kib = hwm_kib - base_kib
    assert delta_kib < 6 * 1024 * 1024, (
        f"tile added {delta_kib/1048576:.1f} GiB peak RSS "
        f"(baseline {base_kib/1048576:.1f}, peak {hwm_kib/1048576:.1f}) — exceeds 6 GiB"
    )
