"""Arrow-vectorized Pandas UDFs.

NOTE: deliberately NO ``from __future__ import annotations`` here --
pandas_udf resolves the type hints at definition time, and stringified
hints (PEP 563) break its signature inspection.
"""

import re

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

# Java's \s is ASCII-only ([ \t\n\x0B\f\r]); Python's \s is Unicode-aware by
# default, so re.ASCII keeps the tokenization identical to Spark's
# split(text, '\\s+') (functions.textfns.tokens).
_WS_ASCII = re.compile(r"\s+", re.ASCII)


def make_word_ngrams(n: int):
    """Arrow-batched word-n-gram shingler -- byte-identical output to
    textfns.word_ngrams (split on ASCII \\s+, drop empties, space-joined
    n-grams, first-occurrence-order distinct, [] under n tokens).

    Exists because Spark's higher-order array expressions
    (sequence/transform/element_at) run INTERPRETED, ~1.8 ms/doc for
    3-gram shingling; this kernel does the same work in ~20 us/doc and
    ships results back as one Arrow batch.
    """

    @pandas_udf("array<string>")
    def _ngrams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in _WS_ASCII.split(t)] if t is not None else []
            toks = [w for w in toks if w]
            if len(toks) >= n:
                # dict keys: distinct, first-occurrence order (= array_distinct)
                out.append(list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))))
            else:
                out.append([])
        return pd.Series(out)

    return _ngrams


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
