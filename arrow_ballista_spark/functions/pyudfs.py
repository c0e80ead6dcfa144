"""Arrow-batched Python UDFs / UDAFs (reference §2.B.11 UDF surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
the pd.Series type hints at decoration time, and PEP 563 stringification
breaks that.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("int")
def norm_len(s: pd.Series) -> pd.Series:
    """Vectorized text normalization length: lower, trim, collapse runs of
    spaces — one Arrow batch per invocation, no per-row Python."""
    return (
        s.str.lower()
        .str.strip()
        .str.replace(r" +", " ", regex=True)
        .str.len()
        .astype("int32")
    )


@pandas_udf("double")
def weighted_qty(q: pd.Series, w: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: weighted mean (ref AggregateUDFExprNode,
    datafusion.proto:558-563)."""
    return float((q * w).sum() / w.sum())
