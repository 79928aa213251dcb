"""Arrow-vectorized Pandas UDFs.

NOTE: deliberately NO ``from __future__ import annotations`` here --
pandas_udf resolves the type hints at definition time, and stringified
hints (PEP 563) break its signature inspection.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_dot_arrow():
    @pandas_udf("double")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av = np.vstack([np.asarray(x, dtype=np.float64) for x in a])
        bv = np.vstack([np.asarray(x, dtype=np.float64) for x in b])
        return pd.Series(np.einsum("ij,ij->i", av, bv))

    return _dot


def make_nearest_cell(cents):
    """argmax-cosine cell assignment against a fixed centroid matrix
    (captured in the closure, shipped once per executor)."""

    @pandas_udf("int")
    def _nearest(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack(v.to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype("int32"))

    return _nearest


def make_probe_cells(cents, nprobe: int):
    """Top-nprobe nearest centroid cells per query vector."""

    @pandas_udf("array<int>")
    def _probe(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        m = np.stack(v.to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        order = np.argsort(-(m @ cents.T), axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    return _probe
