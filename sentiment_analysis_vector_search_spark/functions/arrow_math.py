"""Arrow-batched vector math (Pandas UDFs).

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
the real type hints to infer the UDF kind.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_batch(
    v: pd.Series, qv: pd.Series, nrm: pd.Series, qnrm: pd.Series
) -> pd.Series:
    """Batched cosine: one einsum per Arrow batch instead of a per-row fold."""
    if not len(v):
        return pd.Series([], dtype="float64")
    V = np.stack(v.values)
    Q = np.stack(qv.values)
    dots = np.einsum("ij,ij->i", V, Q)
    return pd.Series(dots / (nrm.values * qnrm.values))
