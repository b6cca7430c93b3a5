"""User-defined-function surface demos: Python UDTF and grouped-aggregate
pandas UDF (SURVEY §2.12 — the reference's injectable-callable registry
maps to these when a step genuinely can't be a built-in expression).

Placement guidance, enforced by the rest of the repo: UDTFs and scalar
Python UDFs are row-at-a-time and NEVER belong in a hot path — the engine's
own token counting is a JVM explode (operators/text.py). These exist as the
API surface for user extension points, tested and oracle-checked on small
slices; grouped-agg pandas UDFs are Arrow-batched (one contiguous group per
call) and are the acceptable custom-aggregate escape hatch."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="word: string, n: int")
class WordCounts:
    """Per-document word frequency rows: (word, count) per distinct word.
    Lateral-join table function — the Spark 3.5+ Python UDTF form."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        words = text.split()
        for w in sorted(set(words)):
            yield w, words.count(w)


@pandas_udf("double")
def milli_exact_mean(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: mean over values quantized to exact
    milli-units (int64 sum — engine- and order-exact, unlike a float sum,
    so the result is DuckDB-oracle-checkable). Arrow hands the whole group
    as one Series; state never crosses batches.

    Quantization is HALF AWAY FROM ZERO via copysign(floor(|v|*1000+0.5)),
    matching SQL round() (DuckDB, Spark bround excluded) — pandas
    ``Series.round()`` is banker's (half-to-even) and diverges on exact .5
    milli boundaries (e.g. 0.0625 → 62.5). Nulls are dropped before the
    cast (astype('int64') raises on NaN); the denominator counts only
    non-null values, same as SQL aggregates."""
    import numpy as np

    vv = v.dropna()
    if len(vv) == 0:
        return float("nan")
    a = vv.to_numpy(dtype="float64") * 1000.0
    iv = np.copysign(np.floor(np.abs(a) + 0.5), a).astype("int64")
    return float(iv.sum()) / (1000.0 * len(iv))
