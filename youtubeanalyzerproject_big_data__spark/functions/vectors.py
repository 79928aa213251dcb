"""Vector math over ``array<float>`` embedding columns.

Two tiers, same sequential-fold IEEE semantics:
  * ``dot``/``norm``/``cosine`` -- generic Catalyst higher-order functions
    (``zip_with`` + ``aggregate``) for occasional / dynamic-width use.
    JVM-side and shuffle-free, but HOFs execute INTERPRETED (outside
    whole-stage codegen), so keep them off per-row hot paths.
  * Arrow exact-sequential kernels (functions/_arrow_udfs.py:
    ``make_cosine_seq``, ``make_hyperplane_sig``, ``make_cell_top1``,
    ``make_cell_probe``, ``make_pq_recon``) -- vectorized over rows,
    sequential over dims, so each scalar result is the identical
    left-to-right IEEE fold; use these on scoring/encode hot paths.

A third option -- statically unrolling the fold into a flat Catalyst
expression chain -- was measured and rejected: a 16-plane x 64-dim
signature (or 8x16x8 PQ encode) exceeds Janino's 64 KB method limit, so
whole-stage codegen pays a failed multi-second compile per stage and then
falls back to interpreted execution anyway (6-8x slower end-to-end than
the Arrow kernels at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
