"""Arrow-batched Python UDFs / UDAFs / UDTFs (reference §2.B.11 surface).

Two import-time constraints shape this module:

- no ``from __future__ import annotations`` — pandas_udf resolves the
  pd.Series type hints at decoration time and PEP 563 stringification
  breaks that;
- no module-level ``@pandas_udf`` decoration — executors import this
  module when unpickling any UDF/UDTF defined here, and decoration needs
  an active session (returnType parsing), which workers don't have.
  UDFs are therefore built by factories, decorated at call time.
"""

import pandas as pd


def norm_len_udf():
    """Vectorized text normalization length: lower, trim, collapse runs
    of spaces — one Arrow batch per invocation, no per-row Python."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def norm_len(s: pd.Series) -> pd.Series:
        return (
            s.str.lower()
            .str.strip()
            .str.replace(r" +", " ", regex=True)
            .str.len()
            .astype("int32")
        )

    return norm_len


def weighted_qty_udaf():
    """GROUPED_AGG pandas UDAF: weighted mean (ref AggregateUDFExprNode,
    datafusion.proto:558-563)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_qty(q: pd.Series, w: pd.Series) -> float:
        return float((q * w).sum() / w.sum())

    return weighted_qty


def window_mod_sum_udf():
    """GROUPED_AGG pandas UDF usable OVER a bounded window frame (the
    reference registers window UDFs on every executor,
    ``ballista/executor/src/executor.rs:67-73``).  Integer sum keeps the
    value bit-exact across engines regardless of frame evaluation order."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def mod_sum(v: pd.Series) -> int:
        return int(v.sum())

    return mod_sum


class WordPositions:
    """Python UDTF: one text row -> (word, pos) rows (whitespace-run
    tokenization, matching the engine's ' +' split semantics)."""

    def eval(self, text: str):
        import re

        if text is None:
            return
        for i, w in enumerate(re.split(" +", text)):
            yield (w, i)
