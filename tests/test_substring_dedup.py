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
