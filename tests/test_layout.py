"""Z-order layout: the pruning claim is proved with parquet footer
statistics, not asserted rhetorically."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.functions.layout import (
    linear_write,
    morton_code,
    zorder_write,
)
from group_2_shopware_enterprise_data_engineering_project_spark.sources import table


def _naive_utc(v):
    """Footer stats for instant (INT64 UTC-adjusted) timestamps come
    back tz-aware; normalize to naive UTC so they compare against the
    naive predicate bounds."""
    import datetime

    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return v


def _files_overlapping_box(path, a_col, a_lo, a_hi, b_col, b_lo, b_hi):
    """Fraction of parquet files whose (min,max) footer stats overlap
    the 2-D box predicate — exactly what a stats-pruning scan reads."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        amin = amax = bmin = bmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == a_col:
                    lo, hi = _naive_utc(st.min), _naive_utc(st.max)
                    amin = lo if amin is None else min(amin, lo)
                    amax = hi if amax is None else max(amax, hi)
                elif name == b_col:
                    lo, hi = _naive_utc(st.min), _naive_utc(st.max)
                    bmin = lo if bmin is None else min(bmin, lo)
                    bmax = hi if bmax is None else max(bmax, hi)
        if amin is None or bmin is None:
            hit += 1  # no stats -> must read
        elif not (amax < a_lo or amin > a_hi or bmax < b_lo or bmin > b_hi):
            hit += 1
    return hit, len(files)


def test_morton_code_interleaves_locally(spark):
    """Nearby points in BOTH dims get nearby codes; far points don't —
    spot-check the interleave arithmetic against a Python reference."""
    import pyspark.sql.functions as F

    def py_morton(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(5, 9), (1000, 7), (65535, 65535), (0, 0), (12345, 54321)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.code
        for r in df.select("a", "b", morton_code(F.col("a"), F.col("b")).alias("code")).collect()
    }
    assert got == {(a, b): py_morton(a, b) for a, b in rows}


def test_zorder_prunes_on_either_dimension(spark, tmp_path):
    """Z-order's actual contract (and why Delta OPTIMIZE ZORDER
    exists): useful footer-stats pruning on EITHER clustered dimension
    ALONE. A single-dim sort beats it narrowly on its own dimension
    but degenerates to a full scan on the other — at 100 TB that is
    the difference between reading ~sqrt-of-table and reading the
    table for half the query mix."""
    import datetime

    orders = table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    n_files = 64
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "l")
    zorder_write(orders, zpath, "o_custkey", "o_orderdate", n_files)
    linear_write(orders, lpath, "o_orderdate", n_files)

    full_cust = dict(a_col="o_custkey", a_lo=-(10**9), a_hi=10**9)
    full_date = dict(
        b_col="o_orderdate",
        b_lo=datetime.datetime(1900, 1, 1),
        b_hi=datetime.datetime(2100, 1, 1),
    )
    cust_pred = dict(a_col="o_custkey", a_lo=100, a_hi=250)
    date_pred = dict(
        b_col="o_orderdate",
        b_lo=datetime.datetime(1996, 1, 1),
        b_hi=datetime.datetime(1996, 7, 1),
    )

    # custkey-only predicate: the date-sorted layout cannot prune AT
    # ALL; z-order must skip at least half
    z_cust, z_total = _files_overlapping_box(zpath, **cust_pred, **full_date)
    l_cust, l_total = _files_overlapping_box(lpath, **cust_pred, **full_date)
    assert l_cust == l_total, "date-sorted layout has no custkey locality"
    assert z_cust <= z_total // 2, f"zorder custkey pruning: {z_cust}/{z_total}"

    # date-only predicate: z-order must still prune meaningfully
    # (coarser than the dedicated date sort — that trade is the point)
    z_date, _ = _files_overlapping_box(zpath, **full_cust, **date_pred)
    l_date, _ = _files_overlapping_box(lpath, **full_cust, **date_pred)
    assert l_date <= l_total // 4  # the dedicated sort is sharpest
    assert z_date <= z_total // 2, f"zorder date pruning: {z_date}/{z_total}"

    # layouts must not change the data
    a = spark.read.parquet(zpath).count()
    b = spark.read.parquet(lpath).count()
    assert a == b == orders.count()


def test_zone_map_pruning_reads_fewer_files_same_answer(spark, tmp_path):
    """Zone-map skipping over a Z-ordered layout: the pruned scan
    selects a strict subset of files on a 2-D box predicate and
    returns exactly the rows a full scan returns."""
    from group_2_shopware_enterprise_data_engineering_project_spark.functions.layout import (
        read_pruned,
        zorder_write,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "z")
    zorder_write(orders, path, "o_custkey", "o_orderkey", n_files=16)

    bounds = {"o_custkey": (10, 40), "o_orderkey": (100, 900)}
    pruned, n_sel, n_total = read_pruned(
        spark, path, ["o_custkey", "o_orderkey"], bounds
    )
    assert n_total >= 8 and 0 < n_sel < n_total  # skipping actually skipped

    full = spark.read.parquet(path).where(
        (F.col("o_custkey").between(10, 40))
        & (F.col("o_orderkey").between(100, 900))
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))


def test_zone_map_keeps_files_with_missing_stats(tmp_path):
    from group_2_shopware_enterprise_data_engineering_project_spark.functions.layout import (
        prune_files,
    )

    stats = {
        "a.parquet": {"_rows": 5, "k": (0, 10)},
        "b.parquet": {"_rows": 5, "k": (100, 200)},
        "c.parquet": {"_rows": 5, "k": (None, None)},  # no stats -> keep
    }
    assert prune_files(stats, {"k": (5, 8)}) == ["a.parquet", "c.parquet"]


def test_aqe_splits_skewed_join(spark, tmp_path):
    """AQE's skew-join handling is the engine-level backstop PERF.md
    leans on — prove it engages: a heavily skewed join under low skew
    thresholds shows skew=true partitions in the final adaptive plan."""
    import pyspark.sql.functions as SF

    # left heavily skewed on one key; right has ONE row per key so the
    # join output stays left-sized (the skew is in partition volume,
    # not in match multiplicity)
    skewed = spark.range(0, 200_000).select(
        SF.when(SF.col("id") % 100 < 99, SF.lit(7)).otherwise(SF.col("id")).alias("k"),
        SF.col("id").alias("payload"),
    )
    other = spark.range(0, 200_000).select(SF.col("id").alias("k"), SF.col("id").alias("p2"))
    conf_keys = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf_keys}
    for k, v in conf_keys.items():
        spark.conf.set(k, v)
    try:
        # keep payload columns in the join output: a count-only
        # projection lets Spark drop the wide columns and the skewed
        # partition can fall under the byte threshold
        j = skewed.join(other, "k")
        jdf = j._jdf
        # materialize THIS DataFrame's own query execution (count()
        # would build a separate one and leave jdf's plan unfinalized)
        jdf.collect()
        plan = jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_index_point_lookup_skips_files_no_false_negatives(spark, tmp_path):
    from group_2_shopware_enterprise_data_engineering_project_spark.functions.layout import (
        build_bloom_index,
        prune_files_bloom,
    )

    path = str(tmp_path / "bl")
    # 8 disjoint key ranges -> 8 files via range partitioning
    spark.range(0, 8000).selectExpr("id AS k", "id * 2 AS v").repartitionByRange(
        8, "k"
    ).write.parquet(path)
    index = build_bloom_index(spark, path, "k")
    assert len(index) == 8

    # no false negatives: every present key's true file survives pruning
    sample_keys = [0, 1234, 4567, 7999]
    truth = {
        key: {
            r.f
            for r in spark.read.parquet(path)
            .selectExpr("k", "input_file_name() AS f")
            .where(F.col("k").isin(sample_keys))
            .collect()
            if r.k == key
        }
        for key in sample_keys
    }
    for key in sample_keys:
        kept = set(prune_files_bloom(index, key))
        assert truth[key] <= kept, key
        # and pruning actually prunes: a key living in one file must not
        # keep all 8 (fp rate at these sizes is far below 7/7)
        assert len(kept) < 8, key

    # an absent value prunes everything (with high probability)
    assert len(prune_files_bloom(index, 10_000_000)) <= 1
