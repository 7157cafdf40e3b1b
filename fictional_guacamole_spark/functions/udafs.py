"""Custom grouped-aggregate pandas UDAFs (Arrow batch transfer).

Kept in a module WITHOUT ``from __future__ import annotations``:
``pandas_udf`` infers the eval type from REAL type hints, and PEP-563
stringified annotations (which that import forces module-wide) break the
inference with UNSUPPORTED_SIGNATURE.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def cents_sum(v: pd.Series) -> int:
    """Exact revenue cents per group: per-element floor-to-cents is
    IEEE-identical across engines, and the int64 sum is order-independent
    — a custom aggregate that still hash-matches a SQL oracle."""
    import numpy as np

    return int(np.floor(v.to_numpy() * 100).astype("int64").sum())


@pandas_udf("long")
def n_rows(v: pd.Series) -> int:
    """Group size as a UDAF: Spark disallows mixing GROUPED_AGG pandas
    UDFs with builtin aggregates in one agg() (INVALID_PANDAS_UDF_
    PLACEMENT), so a UDAF query needs its row count as a UDAF too."""
    return int(len(v))
