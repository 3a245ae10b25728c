"""Symmetric int8 (SQ8) similarity search — searching IN the compressed
tier.

quantize_embeddings_int8 (ops/similarity.py) gives the 4x storage tier;
this module answers top-k queries WITHOUT decompressing: rank by the
integer dot product of the int8 code vectors (symmetric SQ8 distance —
the standard scalar-quantization search mode, cf. FAISS
IndexScalarQuantizer). dot(codes_q, codes_p) is exactly
127^2 * <q/|q|_inf, p/|p|_inf>, i.e. cosine-like similarity of
inf-norm-normalized vectors — recall vs exact cosine is pinned by test.

Cross-engine determinism by construction (the r6 fixed-point
discipline, SURVEY §9): codes are floor(x*127/max|x| + 0.5) clamped to
[-127, 127] — floor(+0.5) is half-up AT THE DOUBLE LEVEL (every op
IEEE-exactly-rounded, so Spark and DuckDB produce identical codes;
note this rounds -2.5 -> -2, unlike ROUND's away-from-zero — a
documented convention of THIS operator), and ranking is by pure int64
dot with p_id tiebreak — no float ever enters the comparator, so the
result hash cannot diverge between engines.

Scale shape: the gate query uses the broadcast brute-force baseline
(the documented exception, like ann_bruteforce); at 10^12 vectors the
same scorer runs inside IVF cluster buckets (equi-join candidates,
ops/similarity.ann_ivf) — the scorer is a plain column expression and
composes with any candidate generator.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _codes_cols(vec: Column, dim: int) -> list[Column]:
    """Unrolled int8 codes for a fixed-dim array column: 64-element
    chains stay inside whole-stage codegen (HOF lambdas run interpreted
    and hide attributes from the optimizer — SURVEY §9 / r5 lesson)."""
    elems = [F.element_at(vec, i + 1).cast("double") for i in range(dim)]
    max_abs = F.greatest(*[F.abs(e) for e in elems]) if dim > 1 else F.abs(elems[0])
    def code(e: Column) -> Column:
        raw = F.floor(e * 127.0 / max_abs + 0.5).cast("int")
        return F.least(F.greatest(raw, F.lit(-127)), F.lit(127))
    zero = max_abs == 0.0
    return [F.when(zero, F.lit(0)).otherwise(code(e)).alias(f"c{i}")
            for i, e in enumerate(elems)]


def quantize_codes(embeddings: DataFrame, dim: int,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, c0..c{dim-1}) — flat int8 code columns (narrow map)."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"), *_codes_cols(F.col(vec_col), dim)
    )


def ann_int8_search(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k symmetric-SQ8 search of the first n_queries vectors (by
    id) against the whole table: (q_id, p_id, rnk, dot). Rank by int64
    code dot desc, p_id asc; self-matches excluded."""
    dim = len(embeddings.select(vec_col).first()[0])
    codes = quantize_codes(embeddings, dim, id_col, vec_col)
    qids = (embeddings.select(F.col(id_col).alias("vec_id"))
            .orderBy("vec_id").limit(int(n_queries)))
    q = codes.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("q_id"),
        *[F.col(f"c{i}").alias(f"q{i}") for i in range(dim)],
    )
    p = codes.select(
        F.col("vec_id").alias("p_id"),
        *[F.col(f"c{i}") for i in range(dim)],
    )
    dot = reduce(
        lambda a, b: a + b,
        [(F.col(f"q{i}").cast("long") * F.col(f"c{i}")) for i in range(dim)],
    )
    scored = (
        p.crossJoin(F.broadcast(q))
        .where(F.col("p_id") != F.col("q_id"))
        .withColumn("dot", dot)
    )
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("p_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .select("q_id", "p_id", F.col("rnk").cast("int").alias("rnk"), "dot")
    )
