"""Every driver-visible registry entry must output ONLY scalar-typed
top-level columns.

The driver's canonicalizer pandas-sorts the result frame before value-
hashing; array/map/struct cells are unhashable there (CORRECTNESS_r05:
``agg_collect_sorted`` red with ``TypeError: unhashable type: 'list'``
despite both engines producing identical sorted arrays). Complex-typed
results must be serialized (``array_join`` / ``to_json``) in the
registry entry, with the complex-typed form kept as a local twin.

This builds every plan (no execution — memoized alongside the parity
gate) and pins the whole class shut.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from minispark_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_scalar_top_level_schema(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
    assert not bad, (
        f"{name}: complex-typed top-level columns {bad} — the driver's "
        "canonicalizer cannot hash list/dict cells; serialize with "
        "array_join/to_json and keep the complex-typed twin local-only"
    )
