"""Approximate-nearest-neighbor search over embedding columns.

Two paths:
  * brute_force_topk -- exact cosine top-k per query.  Query set is
    broadcast (small side), so the corpus never shuffles: each corpus
    partition scores its rows against every query and keeps a local top-k
    heap via window row_number; TakeOrdered semantics, no O(n^2) shuffle.
  * lsh_topk -- random-hyperplane LSH: 16-bit signatures from md5-seeded
    deterministic hyperplanes; query and corpus meet only inside matching
    buckets (multi-probe over b-bit bands), then exact cosine re-ranks.
    This is the 100 TB path: bucketing turns all-pairs into per-bucket
    joins; recall is tunable via bands/rows.

Deterministic "random" hyperplanes: component c of plane p is
(md5_int32(p:c) / 2^31) - 1  in [-1, 1) -- reproducible across engines and
runs with no RNG state.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from youtubeanalyzerproject_big_data__spark.functions.vectors import cosine, dot


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_sim, nn_rank), self-matches excluded.
    ``queries`` is expected small (it is broadcast); corpus scan stays
    shuffle-free until the final per-query top-k window on query_id.
    """
    from youtubeanalyzerproject_big_data__spark.functions.vectors import dot_arrow, norm

    # Norms once per row; per-pair work is one Arrow-batched numpy dot.
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), norm(F.col(vec_col)).alias("qn"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), norm(F.col(vec_col)).alias("cn"))
    d = dot_arrow()
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", d(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "nn_rank")
    )


def _plane_component(p: int, c: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1): the same
    md5-derivation as functions.hashing.md5_int32(str(c), seed=f'plane{p}'),
    evaluated driver-side so the plan carries plain float literals instead
    of thousands of constant md5 expressions (which constant-fold slowly)."""
    h = int(hashlib.md5(f"plane{p}:{c}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def _hyperplane_signature(vec_col: str, dim: int, num_planes: int) -> F.Column:
    """LSH signature: bit p = (v . plane_p) >= 0, planes md5-derived."""
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(_plane_component(p, c)) for c in range(dim)])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + F.shiftleft(bit, p)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    num_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH candidate generation + exact re-rank.

    Signature is split into ``bands`` sub-signatures; query/corpus rows
    sharing any band bucket become candidates.  Output schema matches
    brute_force_topk so recall can be measured directly against it.
    """
    bits_per_band = num_planes // bands
    mask = (1 << bits_per_band) - 1

    def with_bands(df: DataFrame, role: str) -> DataFrame:
        sigd = df.select(F.col(id_col).alias(f"{role}_id"), F.col(vec_col).alias(f"{role}_v")).withColumn(
            "sig", _hyperplane_signature(f"{role}_v", dim, num_planes)
        )
        return sigd.select(
            f"{role}_id",
            f"{role}_v",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("sig"), b * bits_per_band).bitwiseAND(F.lit(mask)).alias("bval"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select(f"{role}_id", f"{role}_v", "bk.band", "bk.bval")

    qb = with_bands(queries, "query")
    cb = with_bands(corpus, "neighbor")
    cands = (
        cb.join(F.broadcast(qb), ["band", "bval"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_v", "neighbor_id", "neighbor_v")
        .distinct()
    )
    scored = cands.withColumn("cos_sim", cosine(F.col("query_v"), F.col("neighbor_v")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "nn_rank")
    )
