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

Implementation note: codes and dots are ARRAY higher-order expressions
(transform / zip_with+aggregate, the ops/similarity._dot precedent).
HOF lambdas run interpreted, but each is ONE expression — an unrolled
64-wide element_at chain was tried first and inflated the task binary
to 9.5 MiB (4096-node projections after CollapseProject inlining);
the array form keeps the plan small, and the integer aggregate is
strict left-to-right in array order, hence deterministic.

Scale shape: the gate query uses the broadcast brute-force baseline
(the documented exception, like ann_bruteforce); at 10^12 vectors the
same scorer runs inside IVF cluster buckets (equi-join candidates,
ops/similarity.ann_ivf) — the scorer is a plain column expression and
composes with any candidate generator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def int8_codes_expr(vec: Column, max_abs: Column) -> Column:
    """array<int> SQ8 codes: floor(x*127/max_abs + 0.5) clamped."""
    def code(v: Column) -> Column:
        raw = F.floor(v.cast("double") * 127.0 / max_abs + 0.5).cast("int")
        return F.least(F.greatest(raw, F.lit(-127)), F.lit(127))
    return F.when(
        max_abs == 0.0, F.transform(vec, lambda v: F.lit(0))
    ).otherwise(F.transform(vec, code))


def int_dot_expr(a: Column, b: Column) -> Column:
    """Exact int64 dot of two int-code arrays (strict left-to-right
    integer accumulation — order-deterministic, engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantize_codes(embeddings: DataFrame,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, codes array<int>) — a narrow map, no shuffle."""
    vec = F.col(vec_col)
    max_abs = F.aggregate(
        vec, F.lit(0.0), lambda a, v: F.greatest(a, F.abs(v.cast("double")))
    )
    d = embeddings.select(
        F.col(id_col).alias("vec_id"), vec.alias("v"), max_abs.alias("max_abs")
    )
    return d.select(
        "vec_id", int8_codes_expr(F.col("v"), F.col("max_abs")).alias("codes")
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
    codes = quantize_codes(embeddings, id_col, vec_col)
    qids = (embeddings.select(F.col(id_col).alias("vec_id"))
            .orderBy("vec_id").limit(int(n_queries)))
    q = codes.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("q_id"), F.col("codes").alias("qcodes")
    )
    p = codes.select(F.col("vec_id").alias("p_id"), "codes")
    scored = (
        p.crossJoin(F.broadcast(q))
        .where(F.col("p_id") != F.col("q_id"))
        .withColumn("dot", int_dot_expr(F.col("qcodes"), F.col("codes")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("p_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .select("q_id", "p_id", F.col("rnk").cast("int").alias("rnk"), "dot")
    )
