"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

The reference's row/group-wise Python callables define the UDF surface
this engine must expose. Policy: the native when/otherwise or window
form is ALWAYS the production path (JVM, codegen); the UDF forms exist
as escape hatches and as differential oracles, exactly like the
reference pairs its pandas loops with SQL (§5). Each function here has
a native twin and a test asserting equality (tests/test_udf_surface.py).

Covered:
- row-at-a-time Python UDF        (``tag_issue_python_udf``)  — slowest
- scalar Pandas UDF (Arrow)       (``tag_issue_pandas_udf``)
- iterator Pandas UDF             (``waterfall_pandas_iter_udf``)
- grouped-agg Pandas UDF (UDAF)   (``weighted_avg_grouped_agg``)
- Python UDTF                     (``calendar_udtf``)
- grouped-map applyInPandas       (ops/windows.replay_running_balance_pandas)
- stateful applyInPandasWithState (streaming/replay_stream.replay_stateful)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType


def tag_issue_native(total: Column, pagado: Column) -> Column:
    """Native twin of the tag_issue classifiers (transform.py:3-15
    condensed to the 2-input form used by the UDF comparisons)."""
    t, p = F.round(total, 2), F.round(pagado, 2)
    return (
        F.when((t == 0) & (p == 0), F.lit("sin_monto"))
        .when(p == t, F.lit(None).cast("string"))
        .when((p == 0) & (t > 0), F.lit("sin_pago"))
        .when(p > t, F.lit("pago_excedente"))
        .otherwise(F.lit("pago_incompleto"))
    )


@udf(returnType=StringType())
def tag_issue_python_udf(total: float, pagado: float) -> str | None:
    """Row-at-a-time Python UDF — the literal reference callable shape
    (transform.py:3-15). 10-100x slower than the native chain at scale;
    exists to validate the escape hatch, never for the hot path."""
    t, p = round(total, 2), round(pagado, 2)
    if t == 0 and p == 0:
        return "sin_monto"
    if p == t:
        return None
    if p == 0 and t > 0:
        return "sin_pago"
    if p > t:
        return "pago_excedente"
    return "pago_incompleto"


@pandas_udf(StringType())
def tag_issue_pandas_udf(total: pd.Series, pagado: pd.Series) -> pd.Series:
    """Scalar Pandas UDF (Arrow-batched) — vectorized escape hatch.

    np.select in the EXACT native if/elif precedence: mask-assignment
    stacks diverge from the native twin wherever a later mask overwrites
    an earlier one (e.g. negative/zero totals fell through every guarded
    mask and returned None instead of 'pago_incompleto').
    """
    import numpy as np

    t, p = total.round(2), pagado.round(2)
    out = np.select(
        [
            (t == 0) & (p == 0),
            p == t,
            (p == 0) & (t > 0),
            p > t,
        ],
        ["sin_monto", None, "sin_pago", "pago_excedente"],
        default="pago_incompleto",
    )
    return pd.Series(out, index=total.index, dtype=object)


def waterfall_pandas_iter_udf():
    """Iterator-of-series Pandas UDF — amortizes per-batch setup (the
    form to use when the UDF loads a model/dictionary once per worker).
    Returns the capped cash column of the waterfall split (P11)."""
    # Explicit SCALAR_ITER eval type: this module uses
    # `from __future__ import annotations`, which stringifies type hints
    # and defeats pandas_udf's signature inference for iterator UDFs.
    from typing import Iterator, Tuple

    from pyspark.sql.functions import PandasUDFType

    @pandas_udf(DoubleType(), PandasUDFType.SCALAR_ITER)
    def capped_cash(batches: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        # one-time per-worker setup would go here
        for total, cash_in in batches:
            yield pd.concat([cash_in, total], axis=1).min(axis=1)

    return capped_cash


def weighted_avg_grouped_agg():
    """Grouped-aggregate Pandas UDF (UDAF surface): value-weighted mean.

    Note: float summation order inside pandas differs from Spark's
    decimal path — use only where tolerance-compare is acceptable.
    """

    @pandas_udf(DoubleType())
    def weighted_avg(value: pd.Series, weight: pd.Series) -> float:
        wsum = float(weight.sum())
        return float((value * weight).sum() / wsum) if wsum else 0.0

    return weighted_avg


@udtf(returnType="cal_date: date")
class calendar_udtf:
    """Python UDTF — table function emitting the daily calendar between
    two dates inclusive: the UDTF twin of the native
    ``explode(sequence(start, end, interval 1 day))`` scaffold (U8).
    Validates the ``spark.udtf``/lateral-join surface."""

    def eval(self, start, end):  # noqa: ANN001
        import datetime as dt

        if start is None or end is None:
            return
        d = start
        while d <= end:
            yield (d,)
            d = d + dt.timedelta(days=1)
