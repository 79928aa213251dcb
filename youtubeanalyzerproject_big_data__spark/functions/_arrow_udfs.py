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
