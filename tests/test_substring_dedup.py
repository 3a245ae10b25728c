"""Substring/paragraph-level exact dedup (VERDICT r6 #1): sub-document
removal lists for repeated spans — the Lee-et-al-style sequence-level
dedup modality. Candidate volume is the corpus chunk count (one
groupBy, no self-join); max_df re-routes boilerplate chunks to
remove-everywhere instead of keep-first."""

import pytest
from pyspark.sql import functions as F

from hgt2osm2_spark.ops.dedup import substring_dedup_spans

BOILER = "all rights reserved click here to subscribe now today"  # 9 words
PARA = "the quick brown fox jumps over the lazy dog again"        # 10 words


def _docs(spark):
    rows = [
        # doc 1: unique text + the boilerplate para
        (1, f"{BOILER} x alpha beta gamma delta epsilon zeta eta theta iota"),
        # doc 2: boilerplate + a paragraph repeated in doc 3
        (2, f"{BOILER} x {PARA}"),
        (3, f"{PARA} one two three four five six seven eight nine ten"),
        (4, f"{BOILER} x unrelated tail words here padding up to ten aa"),
        # doc 5: too short for any chunk
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_duplicate_spans(spark):
    out = substring_dedup_spans(_docs(spark), chunk_words=10).collect()
    by = {(r.doc_id, r.span_start): r.reason for r in out}
    # PARA occurs at doc2 words 10-20 and doc3 words 0-10: canonical
    # first is (2, 10) -> only doc3's occurrence is removed
    assert (3, 0) in by and by[(3, 0)] == "duplicate"
    assert (2, 10) not in by
    # BOILER+x chunk (words 0-10) occurs in docs 1, 2, 4: first is doc1
    assert by.get((2, 0)) == "duplicate" and by.get((4, 0)) == "duplicate"
    assert (1, 0) not in by
    # span offsets are word offsets, end exclusive
    spans = {(r.span_start, r.span_end) for r in out}
    assert all(e - s == 10 for s, e in spans)


def test_boilerplate_valve_removes_all_occurrences(spark):
    """Scale-shape: a chunk in > max_df docs leaves the keep-first path
    (no canonical survivor) and ALL its occurrences are removed — and
    the valve does NOT change the values of ordinary duplicate rows."""
    plain = {(r.doc_id, r.span_start): r.reason
             for r in substring_dedup_spans(_docs(spark), chunk_words=10).collect()}
    capped = {(r.doc_id, r.span_start): r.reason
              for r in substring_dedup_spans(
                  _docs(spark), chunk_words=10, max_df=2).collect()}
    # BOILER chunk: 3 docs > max_df=2 -> hot; doc1's formerly-protected
    # first occurrence is now removed too
    assert capped[(1, 0)] == "boilerplate"
    assert capped[(2, 0)] == "boilerplate"
    assert capped[(4, 0)] == "boilerplate"
    # the PARA duplicate (2 docs <= max_df) is untouched by the valve
    assert capped[(3, 0)] == "duplicate"
    assert (2, 10) not in capped
    # valve only ADDS the hot first-occurrence rows
    assert set(plain) | {(1, 0)} == set(capped)


def test_within_doc_repeats_count(spark):
    """n_occ >= 2 triggers on WITHIN-doc repetition too (n_docs == 1)."""
    docs = spark.createDataFrame(
        [(7, f"{PARA} {PARA}")], "doc_id long, text string")
    out = substring_dedup_spans(docs, chunk_words=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.span_start, r.span_end, r.reason) == (7, 10, 20, "duplicate")


def test_short_docs_and_tails_emit_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "only four words here"), (2, "only four words here"), (3, "")],
        "doc_id long, text string")
    assert substring_dedup_spans(docs, chunk_words=10).count() == 0


def test_linear_no_join_blowup_plan(spark):
    """The plan must contain no cartesian/broadcast-nested-loop: the
    only join is the occ->stats equi-join on chunk_hash."""
    plan = substring_dedup_spans(
        _docs(spark), chunk_words=10, max_df=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_words_validation(spark):
    with pytest.raises(ValueError):
        substring_dedup_spans(_docs(spark), chunk_words=0)

# ------------------------------------------------- apply_span_removals

from hgt2osm2_spark.ops.dedup import apply_span_removals


def _clean_twin(doc_rows, span_rows):
    """Independent scalar derivation of the cleaned corpus."""
    per: dict = {}
    for r in span_rows:
        per.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    out = {}
    for doc_id, text in doc_rows:
        toks = text.strip().lower().split() if text.strip() else []
        sp = per.get(doc_id, [])
        kept = [t for i, t in enumerate(toks)
                if not any(s <= i < e for s, e in sp)]
        out[doc_id] = (" ".join(kept), len(kept), len(toks) - len(kept))
    return out


def test_apply_span_removals_matches_scalar_twin(spark):
    docs = _docs(spark)
    doc_rows = [(r.doc_id, r.text) for r in docs.collect()]
    spans = substring_dedup_spans(docs, chunk_words=10, max_df=2)
    expect = _clean_twin(doc_rows, spans.collect())
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.n_tokens_removed)
           for r in apply_span_removals(docs, spans).collect()}
    assert got == expect
    # every doc survives with exactly one row (removal never drops docs)
    assert set(got) == {d for d, _ in doc_rows}


def test_apply_span_removals_passthrough_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "  Mixed CASE   spacing   here "), (2, ""), (3, "   ")],
        "doc_id long, text string")
    empty_spans = spark.createDataFrame(
        [], "doc_id long, span_start long, span_end long, "
            "chunk_hash string, reason string")
    got = {r.doc_id: r for r in
           apply_span_removals(docs, empty_spans).collect()}
    # no spans: text passes through NORMALIZED (lower, single-space)
    assert got[1].clean_text == "mixed case spacing here"
    assert got[1].n_tokens == 4 and got[1].n_tokens_removed == 0
    for d in (2, 3):
        assert got[d].clean_text == "" and got[d].n_tokens == 0


def test_apply_span_removals_overlapping_spans_compose(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 1, 4, "h1", "duplicate"), (1, 3, 6, "h2", "duplicate")],
        "doc_id long, span_start long, span_end long, "
        "chunk_hash string, reason string")
    r = apply_span_removals(docs, spans).collect()[0]
    # union of [1,4) and [3,6) drops words 1..5 -> keep a, g, h
    assert r.clean_text == "a g h"
    assert (r.n_tokens, r.n_tokens_removed) == (3, 5)


def test_apply_span_removals_broadcast_plan(spark):
    """broadcast_spans=True must hash-join with the folded span list on
    the build side — the corpus side carries no Exchange at all."""
    docs = _docs(spark)
    spans = substring_dedup_spans(docs, chunk_words=10)
    plan = apply_span_removals(docs, spans, broadcast_spans=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_span_clean_roundtrip_is_dry(spark):
    """End-to-end: after removing the listed spans, re-running the
    detector over the cleaned corpus finds nothing left to remove."""
    docs = _docs(spark)
    spans = substring_dedup_spans(docs, chunk_words=10, max_df=2)
    cleaned = apply_span_removals(docs, spans).select(
        "doc_id", F.col("clean_text").alias("text"))
    assert substring_dedup_spans(cleaned, chunk_words=10, max_df=2).count() == 0

# --------------------------------------------------- cdc_dedup_spans

from hgt2osm2_spark.ops.dedup import cdc_dedup_spans

LONGPARA = ("the quick brown fox jumps over the lazy dog while seventeen "
            "green bottles hang on the wall and gradually fall down one "
            "by one until none remain standing anywhere near the old barn")


def _shifted_docs(spark, n=2):
    prefixes = ["", "shifted prefix ", "a much longer three-word ",
                "x "]
    rows = [(i + 1, prefixes[i] + LONGPARA + f" tail{i} words here")
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cdc_catches_shifted_duplicates_fixed_windows_miss(spark):
    """The CDC story in one test: the same paragraph at different word
    offsets is invisible to fixed windows (every boundary shifted) but
    cut into identical chunks by content-defined boundaries."""
    docs = _shifted_docs(spark, n=2)
    assert substring_dedup_spans(docs, chunk_words=10).count() == 0
    out = cdc_dedup_spans(docs, min_words=5).collect()
    assert len(out) > 0
    # keep-first: every removal is in doc 2; spans sit inside the
    # shifted paragraph (offset 2 .. 2+len(PARA))
    npara = len(LONGPARA.split())
    for r in out:
        assert r.doc_id == 2 and r.reason == "duplicate"
        assert 2 <= r.span_start < r.span_end <= 2 + npara


def test_cdc_spans_disjoint_and_in_bounds(spark):
    docs = _shifted_docs(spark, n=4)
    by_doc: dict = {}
    for r in cdc_dedup_spans(docs, min_words=5).collect():
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    ntoks = {r.doc_id: len(r.text.split()) for r in docs.collect()}
    assert by_doc  # something was found
    for d, sp in by_doc.items():
        sp.sort()
        assert all(0 <= s < e <= ntoks[d] for s, e in sp)
        assert all(a[1] <= b[0] for a, b in zip(sp, sp[1:]))


def test_cdc_boilerplate_valve(spark):
    """A paragraph shared by > max_df docs is boilerplate: ALL its
    occurrences are removed, including the formerly-canonical first."""
    docs = _shifted_docs(spark, n=4)
    out = cdc_dedup_spans(docs, min_words=5, max_df=2).collect()
    docs_hit = {r.doc_id for r in out}
    assert 1 in docs_hit  # doc 1's first occurrence no longer protected
    shared = [r for r in out if r.reason == "boilerplate"]
    assert {r.doc_id for r in shared} == {1, 2, 3, 4}


def test_cdc_clean_roundtrip_is_dry(spark):
    docs = _shifted_docs(spark, n=3)
    spans = cdc_dedup_spans(docs, min_words=5, max_df=2)
    cleaned = apply_span_removals(docs, spans).select(
        "doc_id", F.col("clean_text").alias("text"))
    assert cdc_dedup_spans(cleaned, min_words=5, max_df=2).count() == 0


def test_cdc_short_and_empty_docs_emit_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "same four words"), (2, "same four words"), (3, ""), (4, "  ")],
        "doc_id long, text string")
    assert cdc_dedup_spans(docs, min_words=5).count() == 0


def test_cdc_no_join_blowup_plan(spark):
    plan = cdc_dedup_spans(
        _shifted_docs(spark, 2), min_words=5, max_df=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_validation(spark):
    docs = _shifted_docs(spark, 1)
    with pytest.raises(ValueError):
        cdc_dedup_spans(docs, min_words=0)
    with pytest.raises(ValueError):
        cdc_dedup_spans(docs, boundary_hex="0")
    with pytest.raises(ValueError):
        cdc_dedup_spans(docs, boundary_hex="zz")
