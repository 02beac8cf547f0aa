"""Schema-drift tolerance: union snapshots whose schemas evolved.

A long-lived connector's source WILL drift: fields appear (new API
version), disappear (deprecations), and widen (int ids outgrow 32 bits).
The reference pipeline sees this as OTX adding pulse fields between runs
(its transform simply `.get()`s what it knows, `etl_connector.py:100-131`);
an engine that re-processes history must instead reconcile batches written
under DIFFERENT schemas into one frame.

``evolve_union`` is that reconciliation as pure plan algebra — per column:

- present in one side only  -> carried, NULL-filled on the other side
- same type both sides      -> carried as-is
- both numeric              -> widened to the larger type (int < long <
  float < double; decimals widen by max precision/scale)
- otherwise                 -> error (silent casts hide corruption)

Nested structs evolve recursively. No shuffle, no UDF: every
reconciliation is a projection (cast / NULL literal) on top of each scan,
so at 100 TB the cost is the two scans you were already paying — column
pruning and filter pushdown pass straight through the projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_RANK = {
    T.ByteType: 0,
    T.ShortType: 1,
    T.IntegerType: 2,
    T.LongType: 3,
    T.FloatType: 4,
    T.DoubleType: 5,
}


def _widen(a: T.DataType, b: T.DataType, path: str) -> T.DataType:
    if a == b:
        return a
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        integral = max(a.precision - a.scale, b.precision - b.scale)
        return T.DecimalType(min(38, integral + scale), scale)
    ra, rb = _NUMERIC_RANK.get(type(a)), _NUMERIC_RANK.get(type(b))
    if ra is not None and rb is not None:
        return a if ra >= rb else b
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        return _evolved_struct(a, b, path)
    raise TypeError(f"cannot reconcile {path}: {a.simpleString()} vs {b.simpleString()}")


def _evolved_struct(a: T.StructType, b: T.StructType, path: str = "") -> T.StructType:
    bf = {f.name: f for f in b.fields}
    fields: list[T.StructField] = []
    for f in a.fields:  # a's order first, b's novel fields appended
        if f.name in bf:
            dt = _widen(f.dataType, bf[f.name].dataType, f"{path}{f.name}.")
            fields.append(T.StructField(f.name, dt, True))
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    fields.extend(
        T.StructField(f.name, f.dataType, True)
        for f in b.fields
        if f.name not in {x.name for x in a.fields}
    )
    return T.StructType(fields)


def _conform_col(col, have: T.DataType | None, target: T.DataType):
    """Column expression producing ``col`` as ``target``. Structs rebuild
    field-by-field (a plain cast cannot ADD fields); everything else casts."""
    if have is None:
        return F.lit(None).cast(target)
    if isinstance(target, T.StructType) and isinstance(have, T.StructType):
        hf = {f.name: f.dataType for f in have.fields}
        return F.when(
            col.isNull(), F.lit(None).cast(target)
        ).otherwise(
            F.struct(
                *[
                    _conform_col(
                        col.getField(f.name) if f.name in hf else F.lit(None),
                        hf.get(f.name),
                        f.dataType,
                    ).alias(f.name)
                    for f in target.fields
                ]
            )
        )
    return col.cast(target)


def _conform(df: DataFrame, target: T.StructType) -> DataFrame:
    have = {f.name: f.dataType for f in df.schema.fields}
    return df.select(
        *[
            _conform_col(
                F.col(f.name) if f.name in have else F.lit(None),
                have.get(f.name),
                f.dataType,
            ).alias(f.name)
            for f in target.fields
        ]
    )


def evolve_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union ``a`` and ``b`` under the evolved common schema (see module
    docstring for the per-column rules). Column order: ``a``'s columns
    first, ``b``'s novel columns appended."""
    target = _evolved_struct(a.schema, b.schema)
    return _conform(a, target).unionByName(_conform(b, target))
