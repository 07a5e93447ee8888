"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning, the pure-Spark analogue of Delta's OPTIMIZE ZORDER
BY (reference tables are single-column partitioned; multi-dim pruning
is the 100 TB upgrade when queries filter on TWO columns — e.g.
(customer, order day) — and partitioning can serve only one).

The Morton value interleaves the low ``bits`` bits of two dimensions,
so sorting by it places rows close in BOTH dimensions close in the
sort order: any contiguous zvalue range (= any file in a z-sorted
write) covers a bounded rectangle of the key space, which makes
file-level min/max statistics tight on BOTH columns simultaneously —
a plain sort gets tight stats on its leading column only.

Everything here is BIGINT shift/mask arithmetic (exactly mirrorable
in ANSI SQL) and pure projections; the only shuffle anywhere is the
final per-bucket rollup in ``zorder_layout_stats``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of x (even positions)
    and y (odd positions) — masks the inputs, then delegates to the
    repo's single interleave implementation
    (`functions.layout.morton_code`, the one k17's zone-map write also
    uses), so the bit layout cannot drift between the write path and
    these layout statistics."""
    from group_2_shopware_enterprise_data_engineering_project_spark.functions.layout import (
        morton_code,
    )

    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    return morton_code(xm, ym, bits)


def z_value_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """The IDENTICAL Morton expression as ANSI SQL (oracle mirror)."""
    xm = f"(({x}) & {(1 << bits) - 1})"
    ym = f"(({y}) & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    n_buckets: int = 64,
    bits: int = Z_BITS,
) -> DataFrame:
    """Assign every row to a fixed-width zvalue range ("file") and roll
    up per-range row counts and min/max of BOTH dimensions — the
    file-statistics table a z-ordered write produces, and the direct
    evidence of layout quality: each bucket's (max-min) extent stays
    bounded on both columns, so a point/range predicate on either
    column prunes most buckets.

    Fixed-width zvalue ranges (zval div width), NOT ntile: no global
    sort, no single-task window — bucket assignment is a projection
    and the rollup is one map-side-combined groupBy, the same plan at
    any scale.
    """
    width = (1 << (2 * bits)) // n_buckets
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    tagged = df.select(
        (z_value(x, y, bits) / F.lit(width)).cast("long").alias("z_bucket"),
        xm.alias("_x"),
        ym.alias("_y"),
    )
    return tagged.groupBy("z_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("_x").cast("long").alias("x_min"),
        F.max("_x").cast("long").alias("x_max"),
        F.min("_y").cast("long").alias("y_min"),
        F.max("_y").cast("long").alias("y_max"),
    )
