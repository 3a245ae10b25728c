"""Shared cache-scope lifetime helper (VERDICT r6 #7): one copy of the
register-and-release-on-NEXT-call boilerplate, per-family scopes, and a
release_all() for session teardown."""

from hgt2osm2_spark import cache
from hgt2osm2_spark.ops import contours, elevation, spatial, text


def test_scopes_are_singletons_and_per_family():
    assert cache.scope("text") is cache.scope("text")
    assert cache.scope("text") is not cache.scope("knn")
    # the four operator families share the one implementation
    assert text._CACHES is cache.scope("text")
    assert spatial._CACHES is cache.scope("knn")
    assert contours._CACHES is cache.scope("contours")
    assert elevation._CACHES is cache.scope("elevation")


def test_hold_release_and_release_all(spark):
    df = spark.range(10).cache()
    sc = cache.scope("_test_scope")
    assert sc.hold(df) is df
    assert len(sc) == 1
    df.count()
    assert df.storageLevel.useMemory
    sc.release()
    assert len(sc) == 0
    assert not df.storageLevel.useMemory

    df2 = spark.range(5).cache()
    cache.scope("_test_scope").hold(df2)
    df2.count()
    cache.release_all()
    assert not df2.storageLevel.useMemory
    assert len(cache.scope("_test_scope")) == 0


def test_release_on_next_call_pattern(spark):
    """The operator contract: calling a family operator releases the
    PREVIOUS call's cache (here exercised through bm25, the original
    carrier of the pattern)."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the lazy dog")],
        "doc_id long, text string")
    text.bm25_scores(docs, ["quick"]).collect()
    held = list(text._CACHES._live)
    assert len(held) == 1
    text.bm25_scores(docs, ["lazy"]).collect()
    assert held[0] not in text._CACHES._live
    cache.release_all()
