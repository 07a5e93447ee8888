"""Unit tests for PageRank, blocked ER, sequence examples, and
negative sampling."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    er,
    pagerank,
    prep,
)


# --- pagerank -----------------------------------------------------------


def test_pagerank_hub_ranks_highest(spark):
    # star graph: 1,2,3 all point at 4; 4 points at 1
    edges = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 1)], "src long, dst long"
    )
    out = {r.node_id: r for r in pagerank.pagerank(edges, iterations=5).collect()}
    assert len(out) == 4
    assert out[4].rank_units > out[1].rank_units > out[2].rank_units
    assert out[2].rank_units == out[3].rank_units  # symmetric leaves


def test_pagerank_zero_iterations_uniform(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = pagerank.pagerank(edges, iterations=0).collect()
    assert {r.rank_units for r in out} == {pagerank.UNIT}


def test_pagerank_mass_approximately_conserved(spark):
    # floor losses are bounded: total mass stays within edges+nodes
    # units of N*UNIT per iteration
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "src long, dst long"
    )
    out = pagerank.pagerank(edges, iterations=4)
    total = out.agg(F.sum("rank_units")).collect()[0][0]
    n = 10
    assert abs(total - n * pagerank.UNIT) < 4 * (n + 10) * 100


def test_pagerank_dangling_mass_redistributed(spark):
    # 2 is a sink; without dangling handling its inflow would vanish
    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    out = {r.node_id: r for r in pagerank.pagerank(edges, iterations=3).collect()}
    # sources get base + share of the sink's mass, strictly above base
    base = (15 * pagerank.UNIT) // 100
    assert out[1].rank_units > base
    assert out[2].rank_units > out[1].rank_units


def test_pagerank_rejects_negative_iterations(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank.pagerank(edges, iterations=-1)


# --- blocked ER ---------------------------------------------------------


def test_blocked_pairs_finds_near_duplicates(spark):
    df = spark.createDataFrame(
        [
            (1, "acme widget"),
            (2, "acme widgets"),   # distance 1, same block
            (3, "acme wrench"),    # same block (w, 2 tokens), distance > 3
            (4, "zeta widget"),    # different block
        ],
        "id long, name string",
    )
    out = er.blocked_pairs(df, "id", "name", max_distance=2)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(1, 2)}


def test_blocked_pairs_respects_block_cap(spark):
    rows = [(i, f"dup item{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, name string")
    # all 10 share one block; cap below excludes everything
    assert er.blocked_pairs(df, "id", "name", max_block=5).count() == 0
    assert er.blocked_pairs(df, "id", "name", max_block=10).count() > 0


def test_blocked_pairs_emits_each_pair_once(spark):
    df = spark.createDataFrame(
        [(1, "same thing"), (2, "same thing"), (3, "same thing")],
        "id long, name string",
    )
    rows = er.blocked_pairs(df, "id", "name").collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2), (1, 3), (2, 3)}
    assert all(r.distance == 0 for r in rows)


# --- sequence examples --------------------------------------------------


def test_sequence_examples_context_order_and_skip(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (7, t0 + dt.timedelta(minutes=i), i, ev)
        for i, ev in enumerate(["a", "b", "c", "d", "e"])
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = prep.sequence_examples(df, context_len=3).orderBy("ts").collect()
    # first 3 events lack full context
    assert [(r.context, r.label) for r in out] == [
        ("a,b,c", "d"),
        ("b,c,d", "e"),
    ]


def test_sequence_examples_timestamp_ties_break_on_event_id(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, i, ev) for i, ev in enumerate(["x", "y", "z", "w"])]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = prep.sequence_examples(df, context_len=3).collect()
    assert [(r.context, r.label) for r in out] == [("x,y,z", "w")]


# --- negative sampling --------------------------------------------------


def test_negative_sample_excludes_seen_and_is_deterministic(spark):
    inter = spark.createDataFrame(
        [(u, i) for u in (1, 2) for i in range(10) if (u, i) != (1, 5)],
        "u long, i long",
    )
    out1 = prep.negative_sample(inter, "u", "i", pool_size=10, k=3).collect()
    out2 = prep.negative_sample(inter, "u", "i", pool_size=10, k=3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    # user 1 has exactly one unseen pool item -> exactly one negative
    u1 = [r for r in out1 if r.u == 1]
    assert [(r.i, r.rnk) for r in u1] == [(5, 1)]
    # user 2 saw everything in the pool -> no negatives
    assert [r for r in out1 if r.u == 2] == []


def test_triangle_counts_known_graph(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        pagerank as pr,
    )

    # K4 on {1,2,3,4}: every node sits in C(3,2)=3 triangles; node 5
    # hangs off an edge and is in none
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.n_triangles for r in pr.triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert 5 not in out  # zero-triangle nodes don't appear


def test_qgram_pairs_counts_shared_grams(spark):
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcdeX"), (3, "zzzzzz")],
        "id long, name string",
    )
    # 1 vs 2 share grams abc,bcd,cde (3 of 4 each); 3 shares none
    out = {(r.id_a, r.id_b): r.shared for r in
           er.qgram_pairs(df, "id", "name", q=3, min_shared=3).collect()}
    assert out == {(1, 2): 3}
    assert er.qgram_pairs(df, "id", "name", q=3, min_shared=4).count() == 0


def test_qgram_stop_grams_cut(spark):
    # a gram present in every record is dropped from the index
    rows = [(i, f"commonXX{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, name string")
    # with max_df=5 the shared 'com','omm','mmo','mon' grams vanish ->
    # no pair reaches min_shared
    assert er.qgram_pairs(df, "id", "name", q=3, min_shared=2, max_df=5).count() == 0
