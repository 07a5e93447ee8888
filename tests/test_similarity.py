"""ANN similarity search: brute-force ground truth vs numpy, and the
SRP-LSH approximation's guarantees (determinism + subset-of-exact)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import similarity

DIM = 64
N = 40


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(N, DIM).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.randn(DIM).astype(np.float32)  # near-nbr of 0
    rows = [(i, f"lab{i % 3}", [float(x) for x in vecs[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")
    return df, vecs


def test_norms_match_numpy(emb):
    df, vecs = emb
    out = {r.vec_id: r.l2_norm for r in similarity.embedding_norms(df).collect()}
    for i in range(N):
        assert math.isclose(out[i], float(np.linalg.norm(vecs[i].astype(np.float64))), rel_tol=1e-9)


def test_bruteforce_topk_matches_numpy(emb):
    df, vecs = emb
    v = vecs.astype(np.float64)
    sims = (v @ v.T) / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    out = similarity.brute_force_topk(df, query_ids=[0, 5], k=3).collect()
    for qid in (0, 5):
        got = [r.neighbor_id for r in out if r.query_id == qid]
        order = np.argsort(-sims[qid])
        expect = [int(i) for i in order if i != qid][:3]
        assert got == expect
    # planted near-neighbor is rank 1 for query 0
    rank1 = [r for r in out if r.query_id == 0 and r.rank == 1]
    assert rank1 and rank1[0].neighbor_id == 1


def test_lsh_results_subset_of_exact_sims(emb):
    df, _ = emb
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.brute_force_topk(df, query_ids=[0], k=N).collect()
    }
    lsh = similarity.lsh_topk(df, query_ids=[0], k=5).collect()
    for r in lsh:
        # every LSH result's similarity equals the exact one (verify
        # stage is exact); only the candidate set is approximate
        assert math.isclose(r.cos_sim, exact[(r.query_id, r.neighbor_id)], rel_tol=1e-12)


def test_lsh_deterministic(emb):
    df, _ = emb
    a = similarity.lsh_topk(df, query_ids=[0, 1, 2], k=5).collect()
    b = similarity.lsh_topk(df, query_ids=[0, 1, 2], k=5).collect()
    assert a == b


def test_hyperplanes_are_deterministic_rademacher():
    p1 = similarity.hyperplane_signs(4, 8)
    p2 = similarity.hyperplane_signs(4, 8)
    assert p1 == p2
    assert all(v in (1.0, -1.0) for row in p1 for v in row)


def test_ivf_assign_partitions_corpus(emb):
    df, _ = emb
    assigned = similarity.ivf_assign(df, n_centroids=4)
    rows = assigned.collect()
    assert len(rows) == N  # every vector assigned to exactly one list
    assert {r.centroid_id for r in rows} <= {0, 1, 2, 3}
    # a centroid vector is its own nearest centroid (cos=1 with itself)
    own = {r.vec_id: r.centroid_id for r in rows if r.vec_id < 4}
    assert own == {0: 0, 1: 1, 2: 2, 3: 3}


def test_ivf_topk_exact_within_list(emb):
    df, _ = emb
    out = similarity.ivf_topk(df, query_ids=[0], k=3, n_centroids=4)
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.brute_force_topk(df, query_ids=[0], k=N).collect()
    }
    for r in out.collect():
        # similarities are exact; only the candidate list is approximate
        assert math.isclose(r.cos_sim, exact[(r.query_id, r.neighbor_id)], rel_tol=1e-12)


def test_embedding_near_dup_finds_planted(spark, emb):
    df, _ = emb
    dup = df.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "label", "embedding"
    )
    seeded = df.unionByName(dup)
    pairs = similarity.embedding_near_dup_pairs(
        seeded.select("vec_id", "embedding"), threshold=0.95
    ).collect()
    # vec 1 is the fixture's planted near-neighbor of vec 0, so the
    # full clique {0, 1, 1000} pairs up above 0.95
    assert [(p.vec_a, p.vec_b) for p in pairs] == [(0, 1), (0, 1000), (1, 1000)]
    exact_dup = [p for p in pairs if (p.vec_a, p.vec_b) == (0, 1000)]
    assert exact_dup[0].cos_sim > 0.999999
