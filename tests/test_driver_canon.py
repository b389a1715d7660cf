"""Driver-harness canary (VERDICT r5 item #8): replay the round
driver's EXACT result canonicalization — pandas column-name sort,
``sort_values`` over every column, value hash — on each registry
entry's sf0.001 output.

The driver's compare is not just "values equal": it materializes the
Spark result into pandas and canonicalizes it, and that code path has
type constraints our oracle gate doesn't exercise (r5:
``agg_collect_sorted`` produced CORRECT sorted arrays on both engines
yet scored a red ``err`` row because pandas ``sort_values`` cannot
factorize list cells). This canary fails locally on the next
harness-incompatible output type before a round is spent on it.
"""

from __future__ import annotations

import pandas as pd
import pytest

from minispark_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _driver_canon(pdf: pd.DataFrame) -> int:
    """The driver's canonicalization shape: order columns by name,
    sort rows by every column (this is the step that throws on
    unhashable cells — pandas factorizes object columns to sort), then
    reduce to an order-insensitive value hash."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(cols)
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_driver_canonicalization(spark, sf_dir, name):
    pdf = REGISTRY[name].fn(spark, sf_dir).toPandas()
    _driver_canon(pdf)  # must not raise — the hash value itself is free
