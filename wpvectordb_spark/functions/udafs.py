"""User-defined aggregate surface: Arrow-batched grouped-agg Pandas UDFs.

The reference has no UDF/UDAF extension point (SURVEY §2.7); Spark's is
the grouped-aggregate ``pandas_udf`` — whole groups arrive as pandas
Series and reduce vectorized in numpy.  Use for aggregates Catalyst
cannot express (custom sketches, trimmed statistics); everything
expressible with built-ins should stay JVM-side.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def weighted_mean():
    """Grouped-agg UDAF factory: ``sum(v*w)/sum(w)`` per group.

    Factories, not module-level registrations: ``pandas_udf(...)`` parses
    the return-type DDL against the active session, and executor workers
    re-import this module where no session exists.
    """

    def _weighted_mean(v, w):
        vv = v.to_numpy(dtype=np.float64)
        ww = w.to_numpy(dtype=np.float64)
        denom = ww.sum()
        return float((vv * ww).sum() / denom) if denom else float("nan")

    return pandas_udf(_weighted_mean, "double", F.PandasUDFType.GROUPED_AGG)


def trimmed_mean(trim: float = 0.1):
    """Grouped-agg UDAF factory: mean after dropping the top and bottom
    ``trim`` fraction — a robust statistic that needs the whole group
    (no Catalyst equivalent)."""

    def _trimmed_mean(v):
        arr = np.sort(v.to_numpy(dtype=np.float64))
        k = int(len(arr) * trim)
        core = arr[k : len(arr) - k] if len(arr) > 2 * k else arr
        return float(core.mean()) if len(core) else float("nan")

    return pandas_udf(_trimmed_mean, "double", F.PandasUDFType.GROUPED_AGG)
