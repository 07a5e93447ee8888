"""Embedding similarity search (ANN) over array<float> columns.

Two paths, per the standard ANN playbook:

- **Brute-force cosine top-k** — the exact baseline: broadcast the
  query set, crossJoin the corpus, compute cosine with native
  higher-order array expressions (zip_with product + aggregate fold —
  JVM-side, no Python), rank per query with a window. O(|Q| x N) dot
  products; the right choice whenever |Q| is small, at any corpus
  size, because the corpus side never shuffles — it streams past the
  broadcast queries and only (query_id, neighbor_id, sim) survive.

- **Sign-random-projection LSH** (SimHash-for-vectors, Charikar 2002)
  — the scale path: H Rademacher hyperplanes (+-1 entries derived
  from md5, so fully deterministic and SQL-mirrorable), bucket =
  H-bit sign pattern; candidates share a bucket, then exact cosine
  verify + rank within candidates. The corpus shuffles once on the
  H-bit bucket key; recall tunes with H (and would use multi-probe /
  band OR-ing for production recall targets).

All math in double precision with a fixed left-to-right fold order so
results are bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.functions.partitioning import (
    spread,
)

NUM_PLANES = 8
DIM = 64

# Bucket-scaling policy: LSH bucket count must GROW with the corpus, or
# every bucket goes quadratic at scale. num_planes=None on the public
# entry points derives H from the corpus row count (one metadata-cheap
# count()) so expected bucket occupancy stays ~TARGET_BUCKET_ROWS;
# MIN/MAX bound the hash width (2^8=256 .. 2^24=16M buckets).
MIN_PLANES = 8
MAX_PLANES = 24
TARGET_BUCKET_ROWS = 1024
# Hard per-reducer cap for the near-dup self-join: any bucket larger
# than this is salt-split across (s*(s+1))/2 sub-tasks, bounding a
# task's candidate-pair work at ~BUCKET_CAP^2 regardless of skew.
BUCKET_CAP = 1024


def derive_num_planes(
    n_rows: int,
    target_bucket: int = TARGET_BUCKET_ROWS,
    min_planes: int = MIN_PLANES,
    max_planes: int = MAX_PLANES,
) -> int:
    """H such that n / 2^H ~= target_bucket, clamped to [min, max].

    10^9 vectors -> H=20 (1M buckets); <=2^8*target -> the floor H=8,
    which keeps small-corpus oracle runs on the fixed 8-plane family.
    """
    import math

    if n_rows <= target_bucket:
        return min_planes
    return max(min_planes, min(max_planes, math.ceil(math.log2(n_rows / target_bucket))))


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine`` with PRE-COMPUTED norms: bit-identical to
    ``dot(a,b) / (l2_norm(a) * l2_norm(b))`` — ``na``/``nb`` are the
    same ``sqrt(dot(v,v))`` doubles and the ``na * nb`` product keeps
    the same operand order — but the two self-fold norms are evaluated
    once per VECTOR instead of once per PAIR. In every pair/candidate
    stage the norm folds were 2/3 of the per-row array work (r12 stage
    profile: the e2/e5/e6 verify stages are pure executor compute on
    these expressions), so carrying an 8-byte norm per row buys a ~3x
    cut in that stage's arithmetic at any scale."""
    return dot(a, b) / (na * nb)


def _topk_per_query(sims: DataFrame, k: int, sim_col: str = "cos_sim") -> DataFrame:
    """Exact distributed top-k per query WITHOUT shuffling every scored
    row. A window over partitionBy(query_id) ships |Q| x N scored rows
    through one exchange (1e10 rows for 10 queries over a 1e9 corpus);
    instead: (1) per-PHYSICAL-partition top-k — groupBy(query_id,
    spark_partition_id) completes map-side, so the exchange carries at
    most |Q| x num_partitions x k rows — then (2) top-k of that union.
    Semantics are identical to ranking by (sim DESC, neighbor_id ASC):
    elements sort by a (-sim, neighbor_id) struct key; `+ 0.0`
    normalizes an IEEE -0.0 so both engines order sim == 0 rows purely
    by the neighbor tiebreak, and a NaN sim (zero-norm vector -> 0/0)
    maps to -Infinity so it ranks FIRST — both Spark's descending sort
    and DuckDB's ORDER BY DESC treat NaN as the largest double, and a
    naive negation would instead sink it to last. Output: (query_id,
    neighbor_id, sim_col, rank), rank 1-based.
    """
    neg = F.when(F.isnan(F.col(sim_col)), F.lit(float("-inf"))).otherwise(
        (F.lit(0.0) - F.col(sim_col)) + F.lit(0.0)
    )
    elem = F.struct(
        neg.alias("_neg"),
        F.col("neighbor_id").alias("neighbor_id"),
        F.col(sim_col).alias(sim_col),
    )
    topk = lambda col: F.slice(F.array_sort(F.collect_list(col)), 1, k)  # noqa: E731
    stage1 = (
        sims.withColumn("_pid", F.spark_partition_id())
        .groupBy("query_id", "_pid")
        .agg(topk(elem).alias("_t"))
    )
    stage2 = (
        stage1.select("query_id", F.explode("_t").alias("_e"))
        .groupBy("query_id")
        .agg(topk(F.col("_e")).alias("_t"))
    )
    return stage2.select(
        "query_id", F.posexplode("_t").alias("_pos", "_e")
    ).select(
        "query_id",
        F.col("_e.neighbor_id").alias("neighbor_id"),
        F.col(f"_e.{sim_col}").alias(sim_col),
        (F.col("_pos") + 1).cast("long").alias("rank"),
    )


def embedding_norms(emb: DataFrame) -> DataFrame:
    v = _as_double(F.col("embedding"))
    return spread(emb).select(
        "vec_id", "label", l2_norm(v).alias("l2_norm")
    )


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query vector (self excluded).

    Queries are broadcast; the corpus side is embarrassingly parallel.

    This is the ONE similarity path that does NOT use the
    ``cosine_pre`` norm precompute: a 3-arm interleaved A/B at sf0.1
    (r13, permuted run order; medians over 6 reps) read plain
    ``cosine`` 1.11 s vs corpus-side precompute 2.22 s vs query-only
    precompute 1.50 s — the scan-side norm projection costs more than
    it saves when each corpus row is scored against only |Q| broadcast
    queries (|Q| is small on the brute path by construction; exact
    scoring of every corpus row is only sane for few queries). The
    precompute stays in the LSH/IVF/near-dup/semdedup paths, where a
    vector's norm amortizes over its whole candidate fan-out and the
    r12 plan-verified wins (e6 1.67x) live.
    """
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    queries = F.broadcast(
        emb.filter(query_pred).select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("qv"),
        )
    )
    corpus = spread(emb).select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("nv"),
    )
    sims = (
        queries.crossJoin(corpus)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("cos_sim"),
        )
    )
    return _topk_per_query(sims, k).orderBy("query_id", "rank")


def hyperplane_signs(num_planes: int = NUM_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic Rademacher (+-1) hyperplanes: sign of component
    (p, d) = first hex digit of md5("p:d"). No RNG -> reproducible
    everywhere, including in SQL oracles."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1.0 if h[0] in "01234567" else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """H-bit sign-pattern bucket key, e.g. '01101001'."""
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(s) for s in row])
        d = dot(vec, plane)
        bits.append(F.when(d > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _lsh_search(
    emb: DataFrame,
    query_ids: list[int] | None,
    query_pred: Column | None,
    k: int,
    num_planes: int | None,
    n_flip_bits: int,
) -> DataFrame:
    """Shared SRP-LSH search body: bucket the corpus once, broadcast
    the query side fanned out to its own bucket plus the first
    ``n_flip_bits`` Hamming-distance-1 probe buckets, exact-cosine the
    candidates, rank with the partial top-k. ``n_flip_bits=0`` is
    plain single-bucket LSH; ``n_flip_bits=num_planes`` is full
    1-bit multi-probe. One body so the bucketing/cosine semantics
    cannot drift between the two public entry points."""
    if num_planes is None:
        num_planes = derive_num_planes(emb.count())
    planes = hyperplane_signs(num_planes)
    bucketed = spread(emb).select(
        F.col("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
        l2_norm(_as_double(F.col("embedding"))).alias("_vn"),
        lsh_bucket(_as_double(F.col("embedding")), planes).alias("bucket"),
    )
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    flip = lambda i: F.concat(  # noqa: E731 — flip sign bit i (1-based)
        F.substring(F.col("qbucket"), 1, i - 1),
        F.when(F.substring(F.col("qbucket"), i, 1) == "1", F.lit("0")).otherwise(
            F.lit("1")
        ),
        F.substring(F.col("qbucket"), i + 1, num_planes - i),
    )
    queries = F.broadcast(
        bucketed.filter(query_pred)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("_vn").alias("_qn"),
            F.col("bucket").alias("qbucket"),
        )
        .select(
            "query_id",
            "qv",
            "_qn",
            F.explode(
                F.array(
                    F.col("qbucket"), *[flip(i) for i in range(1, n_flip_bits + 1)]
                )
            ).alias("pbucket"),
        )
    )
    cands = (
        queries.join(bucketed, queries["pbucket"] == bucketed["bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("qv"), F.col("v"), F.col("_qn"), F.col("_vn")
            ).alias("cos_sim"),
        )
    )
    return _topk_per_query(cands, k).orderBy("query_id", "rank")


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
    num_planes: int | None = NUM_PLANES,
) -> DataFrame:
    """ANN top-k within same-bucket candidates. Approximate: neighbors
    in other buckets are missed by design (recall ~ (1 - theta/pi)^H
    per Charikar's collision bound); determinism is exact.

    num_planes=None derives H from the corpus size (bucket-scaling
    policy) so buckets don't grow with the corpus. Reducer skew is a
    non-issue on this path: queries are BROADCAST, so the bucket match
    is a map-side hash join — the corpus never shuffles on the bucket
    key and an oversized bucket just streams past the query map.
    """
    return _lsh_search(emb, query_ids, query_pred, k, num_planes, n_flip_bits=0)


def lsh_topk_multiprobe(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
    num_planes: int | None = NUM_PLANES,
) -> DataFrame:
    """Multi-probe SRP-LSH (Lv et al. 2007): besides its own bucket,
    each query probes the H Hamming-distance-1 buckets (one sign bit
    flipped). A near neighbor that disagrees on exactly one hyperplane
    — the dominant miss mode at high cosine — is recovered, so recall
    rises steeply without adding planes (which would shrink every
    bucket and cost corpus-side work instead of query-side).

    Cost shape: the corpus is bucketed once (same as `lsh_topk`); only
    the BROADCAST query side fans out x(H+1). Probe buckets are
    pairwise distinct and each corpus vector lives in exactly one
    bucket, so a (query, neighbor) candidate arises at most once — no
    dedup stage. Candidates then rank via the partial top-k.
    """
    if num_planes is None:
        num_planes = derive_num_planes(emb.count())
    return _lsh_search(
        emb, query_ids, query_pred, k, num_planes, n_flip_bits=num_planes
    )


N_CENTROIDS = 16

# --- sampled k-means (trained coarse quantizer) ----------------------------
# Centroid means are snapped to a 1e-6 grid: per-dimension component =
# SUM(BIGINT floor(x*1e6 + 0.5)) / (count * 1e6). BIGINT addition is
# associative (order-free across partitions/engines) and the final
# int/int double division is IEEE-exact, so trained centroids are
# bit-identical between Spark and the DuckDB oracle — a float mean
# would be summation-order-dependent and break the exact hash compare.
KMEANS_ITERS = 2
KMEANS_SCALE = 1_000_000
KMEANS_SAMPLE = 4096
TARGET_LIST_ROWS = 1024
MIN_CENTROIDS = 4
MAX_CENTROIDS = 65_536


def derive_n_centroids(
    n_rows: int,
    min_centroids: int = MIN_CENTROIDS,
    max_centroids: int = MAX_CENTROIDS,
) -> int:
    """C ~= ceil(sqrt(n)), clamped. The sqrt rule balances per-query
    probe cost (C centroid dot products) against list-scan cost
    (n_probe * n/C candidates) — the standard IVF sizing. 10^9 vectors
    -> ~32k lists of ~32k vectors."""
    import math

    if n_rows <= 0:
        return min_centroids
    return max(min_centroids, min(max_centroids, math.ceil(math.sqrt(n_rows))))


def _sample_key() -> Column:
    """Deterministic cross-engine shuffle key: md5 of the decimal id
    string, identical in Spark (md5 of UTF-8 bytes) and DuckDB
    (md5(CAST(vec_id AS VARCHAR)))."""
    return F.md5(F.col("vec_id").cast("string").cast("binary"))


def _assign_nearest(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """TRULY map-side nearest-centroid assignment: the centroid set is
    packed into ONE array-of-structs row (sorted by centroid_id),
    broadcast, and each vector folds over it keeping the best
    (strictly-greater cosine; ties keep the earlier = lowest id) —
    identical semantics to ranking c_sim DESC, centroid_id ASC, but
    with ZERO shuffle. The naive crossJoin + window-per-vec_id
    formulation shuffles N x C scored rows (3e13 at N=1e9, C=sqrt(N));
    this fold is whole-stage-codegen per corpus row. NaN cosines
    (zero-norm vector or centroid) rank LARGEST — matching the
    window / DuckDB ORDER BY DESC semantics the oracles use: the
    first (lowest-id) NaN-sim centroid wins and is never displaced.
    vectors: (vec_id, v) -> (vec_id, v, nv, centroid_id) — ``nv`` is
    the vector's l2 norm, computed ONCE here (the fold previously
    re-derived it per centroid, C norm-folds per row) and carried so
    downstream candidate scoring never re-folds it either."""
    packed = centroids.groupBy().agg(
        # centroid_id leads the struct and is unique, so array_sort
        # orders identically with the precomputed norm field appended
        F.array_sort(
            F.collect_list(
                F.struct("centroid_id", "cv", l2_norm(F.col("cv")).alias("ncv"))
            )
        ).alias("_cents")
    )
    init = F.struct(
        F.lit(-2.0).cast("double").alias("sim"), F.lit(-1).cast("long").alias("id")
    )

    def step(acc, c):
        s = cosine_pre(F.col("v"), c["cv"], F.col("nv"), c["ncv"])
        take = (~F.isnan(acc["sim"])) & (F.isnan(s) | (s > acc["sim"]))
        return F.when(
            take,
            F.struct(s.alias("sim"), c["centroid_id"].cast("long").alias("id")),
        ).otherwise(acc)

    best = F.aggregate(F.col("_cents"), init, step)
    return (
        vectors.withColumn("nv", l2_norm(F.col("v")))
        .crossJoin(F.broadcast(packed))
        .select("vec_id", "v", "nv", best["id"].alias("centroid_id"))
    )


def _int_mean_centroids(assigned: DataFrame, scale: int = KMEANS_SCALE) -> DataFrame:
    """Lloyd update with integer-snapped means (see module comment):
    posexplode -> per-(centroid, dim) BIGINT sum -> exact division ->
    reassemble the array ordered by dimension. One shuffle on
    (centroid_id, pos); empty clusters drop out, as in the oracle."""
    exploded = assigned.select(
        "centroid_id", F.posexplode("v").alias("pos", "val")
    )
    means = exploded.groupBy("centroid_id", "pos").agg(
        (
            F.sum(F.floor(F.col("val") * scale + F.lit(0.5)).cast("long")).cast(
                "double"
            )
            / (F.count(F.lit(1)) * F.lit(float(scale)))
        ).alias("m")
    )
    return means.groupBy("centroid_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cv")
    )


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int | None = None,
    iters: int = KMEANS_ITERS,
    sample: int = KMEANS_SAMPLE,
) -> DataFrame:
    """Train IVF centroids: Lloyd iterations on a deterministic
    md5-ordered sample (distributed top-k take, never a full sort),
    seeded by the sample's first `n_centroids` rows. n_centroids=None
    derives C from the corpus size (sqrt rule). Returns (centroid_id,
    cv) MATERIALIZED — training runs eagerly, the sample cache is
    released, and the result is rebuilt as a local-rows DataFrame.
    Centroids are a *model* (<= MAX_CENTROIDS rows by construction),
    so driver materialization is the standard k-means contract; it
    also keeps downstream plans free of the training lineage and
    leaves no persisted RDDs pinned for the session's lifetime."""
    if n_centroids is None:
        n_centroids = derive_n_centroids(emb.count())
    base = spread(emb).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    samp = (
        base.orderBy(_sample_key(), "vec_id").limit(sample).persist()
    )
    try:
        seed = (
            samp.orderBy(_sample_key(), "vec_id")
            .limit(n_centroids)
            .select(
                (
                    F.row_number().over(Window.orderBy(_sample_key(), "vec_id")) - 1
                ).alias("centroid_id"),
                F.col("v").alias("cv"),
            )
        )
        cents = seed
        for _ in range(iters):
            cents = _int_mean_centroids(_assign_nearest(samp, cents))
        rows = cents.collect()
        return emb.sparkSession.createDataFrame(rows, cents.schema)
    finally:
        samp.unpersist()


def _centroids(emb: DataFrame, n_centroids: int):
    """Broadcast centroid set: the first `n_centroids` vectors by id —
    a deterministic, training-free quantizer. The e5/e7 oracle family
    mirrors exactly this seed; `kmeans_centroids` is the trained
    alternative (e9) for real skewed corpora."""
    return F.broadcast(
        emb.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("centroid_id"),
            _as_double(F.col("embedding")).alias("cv"),
        )
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = N_CENTROIDS,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest
    centroid by cosine (ties -> lowest centroid id).

    The centroid set broadcasts (n_centroids x dim floats), so
    assignment is a map-side crossJoin + per-vector argmin: the corpus
    never shuffles to get partitioned into lists.
    """
    if centroids is None:
        centroids = _centroids(emb, n_centroids)
    return _assign_nearest(
        spread(emb).select(
            F.col("vec_id"), _as_double(F.col("embedding")).alias("v")
        ),
        centroids,
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = 1,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat ANN: probe the query's `n_probe` nearest centroid lists
    and rank exact cosine within the probed candidates.

    The scale shape: the corpus shuffles ONCE on centroid_id into
    inverted lists; each query touches ~n_probe * N/n_centroids vectors
    instead of N. Recall tunes with n_probe — at n_probe == n_centroids
    the result equals brute force exactly (tests/test_similarity.py
    pins recall@k monotonicity and that equivalence). Pass
    ``centroids`` (e.g. from ``kmeans_centroids``) to search against a
    trained quantizer instead of the first-N seed.
    """
    if centroids is None:
        centroids = _centroids(emb, n_centroids)
    else:
        # trained centroids arrive materialized (kmeans_centroids) —
        # broadcast-hint only, no persist to leak across the session
        centroids = F.broadcast(centroids)
    # persist released in the finally below: the result (top-k per
    # query) is materialized eagerly first, so the corpus-sized
    # assignment cache never outlives this call (cache-release
    # discipline per kmeans_centroids/pagerank).
    assigned = ivf_assign(emb, centroids=centroids).persist()
    try:
        return _ivf_topk_body(assigned, query_pred, query_ids, centroids, n_probe, k)
    finally:
        assigned.unpersist()


def _ivf_topk_body(
    assigned: DataFrame,
    query_pred,
    query_ids,
    centroids: DataFrame,
    n_probe: int,
    k: int,
) -> DataFrame:
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    queries = assigned.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("_qn"),
    )
    # Per-query probe list: rank all centroids by cosine (|Q| x C rows,
    # both sides driver-small) and keep the n_probe nearest.
    wq = Window.partitionBy("query_id").orderBy(
        F.col("p_sim").desc(), F.col("centroid_id")
    )
    probes = F.broadcast(
        queries.crossJoin(centroids)
        .select(
            "query_id",
            "qv",
            "_qn",
            "centroid_id",
            # |Q| x C probe-scoring rows — driver-small, so only the
            # query-side norm is worth carrying here
            (
                dot(F.col("qv"), F.col("cv"))
                / (F.col("_qn") * l2_norm(F.col("cv")))
            ).alias("p_sim"),
        )
        .withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "_qn", F.col("centroid_id").alias("qc"))
    )
    # the corpus side is aliased: probes derives from the same
    # `assigned` frame, so bare column refs to its attributes would be
    # ambiguous under self-join lineage
    corp = assigned.alias("_corp")
    cands = (
        probes.join(corp, F.col("qc") == F.col("_corp.centroid_id"))
        .filter(F.col("_corp.vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("_corp.vec_id").alias("neighbor_id"),
            cosine_pre(
                F.col("qv"), F.col("_corp.v"), F.col("_qn"), F.col("_corp.nv")
            ).alias("cos_sim"),
        )
    )
    out = _topk_per_query(cands, k).orderBy("query_id", "rank")
    # |Q| x k rows — eager materialization is cheap and lets the caller
    # (ivf_topk) release the corpus-sized assignment cache on return
    return out.localCheckpoint(eager=True)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    num_planes: int | None = NUM_PLANES,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup stage
    of a training-data pipeline): SRP-LSH buckets -> same-bucket
    candidate pairs -> exact cosine >= threshold.

    Scale shape: num_planes=None derives H from the corpus size so
    expected bucket occupancy is constant, and any bucket that STILL
    exceeds `bucket_cap` (skew: dense embedding clusters, exact-dup
    floods) is salt-split — its rows are hashed into s = ceil(n/cap)
    groups and the (i, j) group-pair sub-tasks are enumerated
    explicitly, so no reducer ever sees more than ~cap^2 candidate
    pairs. The split is LOSSLESS: every same-bucket pair lands in
    exactly one (min(g_a, g_b), max(g_a, g_b)) sub-task, so results are
    identical to the unsalted join — skew changes the schedule, never
    the answer. Near-identical vectors agree on every hyperplane sign
    with probability ~(1 - theta/pi)^H, so high-threshold pairs are
    rarely missed. Output ordered for determinism.
    """
    if num_planes is None:
        num_planes = derive_num_planes(emb.count())
    planes = hyperplane_signs(num_planes)
    bucketed = spread(emb).select(
        F.col("vec_id"),
        _as_double(F.col("embedding")).alias("v"),
        l2_norm(_as_double(F.col("embedding"))).alias("_vn"),
        lsh_bucket(_as_double(F.col("embedding")), planes).alias("bucket"),
    )
    # persisted so the salt-split's oversized-bucket sizing agg and the
    # pair join share one evaluation of the H-plane projection (the
    # sizing branch would otherwise re-run lsh_bucket over the corpus;
    # r7 bisect, PERF.md)
    bucketed = bucketed.persist()
    tasks = _salted_pair_tasks(bucketed, bucket_cap).persist()
    try:
        return _near_dup_pairs_body(tasks, threshold)
    finally:
        tasks.unpersist()
        bucketed.unpersist()


def _near_dup_pairs_body(tasks: DataFrame, threshold: float) -> DataFrame:
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.saltjoin import (
        salted_pair_join,
    )

    pairs = (
        salted_pair_join(tasks, ("bucket",), "vec_id")
        .select(
            F.least(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_a"),
            F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_b"),
            cosine_pre(
                F.col("a.v"), F.col("b.v"), F.col("a._vn"), F.col("b._vn")
            ).alias("cos_sim"),
        )
    )
    # No terminal global sort on the (potentially huge) pair list;
    # only threshold-surviving pairs (id, id, sim — no vectors)
    # materialize, so the salted-task cache can be released on return.
    return pairs.filter(F.col("cos_sim") >= threshold).localCheckpoint(eager=True)


SEMDEDUP_THRESHOLD = 0.4


def derive_semdedup_centroids(
    n_rows: int,
    target_cluster: int = TARGET_LIST_ROWS,
    min_centroids: int = MIN_CENTROIDS,
    max_centroids: int = MAX_CENTROIDS,
) -> int:
    """C = ceil(n / target_cluster), clamped. Unlike IVF's sqrt rule
    (which balances probe cost vs list-scan cost), SemDedup's cluster
    count must grow LINEARLY with the corpus: the within-cluster
    self-join does O(size^2) work per cluster, so holding expected
    cluster size constant (~target_cluster rows) keeps per-cluster
    pair work bounded at any corpus scale — 10^9 vectors -> ~10^6
    clusters of ~1k (capped at MAX_CENTROIDS, where the residual
    oversize is absorbed by the salt-split cap instead)."""
    import math

    if n_rows <= 0:
        return min_centroids
    return max(
        min_centroids, min(max_centroids, math.ceil(n_rows / target_cluster))
    )


def semdedup(
    emb: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_centroids: int | None = None,
    centroids: DataFrame | None = None,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means clustering + within-cluster cosine.

    Each vector keeps unless some LOWER-id vector in its cluster is
    more similar than `threshold` — the lowest id in any semantic
    duplicate group survives as the representative, exactly the
    keep-one-per-group rule of the paper (which keeps one point per
    high-similarity pair within each cluster; id order stands in for
    the paper's arbitrary choice, making the result deterministic).

    Scale shape (the reason this beats all-pairs near-dup for SEMANTIC
    — mid-similarity — dedup, where LSH recall collapses):
    - centroids are a trained sampled-k-means model (`kmeans_centroids`
      — driver-small, broadcast);
    - assignment is the zero-shuffle packed-centroid fold
      (`_assign_nearest`);
    - the only wide exchange is the self-join's shuffle on
      centroid_id, with cluster count derived linearly from corpus
      size (`derive_semdedup_centroids`) so expected per-cluster work
      is constant, and `_salted_pair_tasks` hard-capping any skewed
      cluster at ~bucket_cap^2 candidate pairs per task;
    - the shuffle carries (vec_id, v, cluster) — vectors, not
      payloads, and only cluster-mates ever meet.

    Returns one row per input vector: (vec_id, centroid_id,
    max_lower_sim, keep) — max_lower_sim is NULL when no lower-id
    cluster-mate exists (cluster representatives), and such rows
    always keep.
    """
    if centroids is None:
        if n_centroids is None:
            n_centroids = derive_semdedup_centroids(emb.count())
        centroids = kmeans_centroids(emb, n_centroids=n_centroids)
    assigned = ivf_assign(emb, centroids=centroids).persist()
    try:
        return _semdedup_body(assigned, threshold, bucket_cap)
    finally:
        assigned.unpersist()


def _semdedup_body(
    assigned: DataFrame, threshold: float, bucket_cap: int
) -> DataFrame:
    bucketed = assigned.select(
        "vec_id", "v", "nv", F.col("centroid_id").alias("bucket")
    )
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.saltjoin import (
        salted_pair_join,
    )

    tasks = _salted_pair_tasks(bucketed, bucket_cap)
    # Same lossless sub-task enumeration as embedding_near_dup_pairs;
    # orientation matters here: the HIGHER id of each pair is the dup
    # candidate, so attribute the similarity to greatest(vec_id).
    pair_sims = salted_pair_join(tasks, ("bucket",), "vec_id").select(
        F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_id"),
        cosine_pre(
            F.col("a.v"), F.col("b.v"), F.col("a.nv"), F.col("b.nv")
        ).alias("sim"),
    )
    # max() is order-free, so the reduced column is exactly
    # reproducible cross-engine; NaN (zero-norm vectors) ranks largest
    # in BOTH Spark and DuckDB max/comparison semantics.
    max_lower = pair_sims.groupBy("vec_id").agg(
        F.max("sim").alias("max_lower_sim")
    )
    out = (
        assigned.join(max_lower, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            "max_lower_sim",
            (
                F.col("max_lower_sim").isNull()
                | (F.col("max_lower_sim") < F.lit(threshold))
            ).alias("keep"),
        )
    )
    # one narrow row per input vector (ids + sim + flag, no vectors) —
    # eager so semdedup() can release the assignment cache on return
    return out.localCheckpoint(eager=True)


def _salted_pair_tasks(bucketed: DataFrame, bucket_cap: int) -> DataFrame:
    """Shared lossless salt-split (see operators/saltjoin.py — single
    implementation of the bounded-reducer pattern, reused by the
    MinHash band join as well)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators.saltjoin import (
        salted_pair_tasks,
    )

    return salted_pair_tasks(bucketed, bucket_cap, ("bucket",), "vec_id")


def label_stats(emb: DataFrame) -> DataFrame:
    """Per-label corpus stats (count + norm extrema — order-independent
    aggregates only, so exactly reproducible)."""
    v = _as_double(F.col("embedding"))
    norms = emb.select("label", l2_norm(v).alias("n"))
    return (
        norms.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("n").alias("min_norm"),
            F.max("n").alias("max_norm"),
        )
        .orderBy("label")
    )


# --- int8 scalar quantization ----------------------------------------------


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """Per-vector max-abs int8 quantization: q_i = round_half_up(x_i *
    127 / max|x|) in [-127, 127]. At 100 TB this is the
    storage/bandwidth lever of vector search — 4x smaller than
    float32 AND integer dot products, at a small recall cost that
    `test_similarity.py` measures rather than assumes.

    Scale factors cancel inside cosine (cos(qa, qb) needs no
    dequantization), so downstream search carries only the int vector
    and its precomputed integer-exact norm. floor(x*s + 0.5) is the
    deterministic rounding both engines share (F.round's half-even on
    doubles is not guaranteed identical cross-engine).
    """
    x = _as_double(F.col("embedding"))
    s = F.lit(127.0) / F.array_max(F.transform(x, F.abs))
    qvec = F.transform(x, lambda v: F.floor(v * s + F.lit(0.5)).cast("long"))
    qq = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("qvec"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        spread(emb)
        .select("vec_id", qvec.alias("qvec"))
        .withColumn("qnorm", F.sqrt(qq.cast("double")))
    )


def quantized_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k on int8-quantized cosine: integer dot
    products (exact, fold-order-free semantics since int addition is
    associative — though the fold is still fixed-order) divided by
    precomputed norms. Same broadcast-queries/corpus-streams shape as
    `brute_force_topk`; the corpus side is 4x less I/O.
    """
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    q = quantize_embeddings(emb)
    queries = F.broadcast(
        q.filter(query_pred).select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("qa"),
            F.col("qnorm").alias("na"),
        )
    )
    corpus = q.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qvec").alias("qb"),
        F.col("qnorm").alias("nb"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sims = (
        queries.crossJoin(corpus)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (idot.cast("double") / (F.col("na") * F.col("nb"))).alias("q_cos_sim"),
        )
    )
    return _topk_per_query(sims, k, sim_col="q_cos_sim")


# --- product quantization (PQ) ANN -----------------------------------------
#
# The memory-compression path beyond int8 scalar quantization (e8):
# split each D-dim vector into PQ_M contiguous subvectors, quantize
# each against a per-subspace codebook of PQ_CODES centroids, and
# store only the code ids — D*4 bytes -> PQ_M bytes per vector (64x at
# the defaults). Search uses Asymmetric Distance Computation: the
# query stays full-precision, per-(subspace, code) distances form a
# tiny table, and a corpus vector's approximate distance is the sum of
# PQ_M table lookups — no decompression, no per-dim math at scan time.
#
# Codebook discipline mirrors the IVF pair e5/e9: `pq_seed_codebook`
# is the training-free deterministic quantizer (subvectors of the
# first PQ_CODES vectors by id) that the e12 oracle reproduces in SQL;
# real corpora should train per-subspace k-means instead (same
# sampled-Lloyd machinery as `kmeans_centroids`, one run per
# subspace). Float discipline: every distance is a sequential
# left-fold over ascending dims (matches list_sum), and the PQ_M
# partial distances are added in explicit subspace order — bit-
# identical to the oracle's CASE-pivoted d0+d1+d2+d3.

PQ_M = 4
PQ_CODES = 16
PQ_SUB_DIM = DIM // PQ_M


def sq_dist(a: Column, b: Column) -> Column:
    """Sequential left-fold squared L2 distance (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_seed_codebook(
    emb: DataFrame, m: int = PQ_M, k_codes: int = PQ_CODES
) -> DataFrame:
    """Training-free PQ codebook: subspace s's codes are dims
    [s*sub_dim, (s+1)*sub_dim) of the first ``k_codes`` vectors by id.
    Returns (sub, code, cv) — a model-sized table (m * k_codes rows).
    """
    sub_dim = DIM // m
    base = emb.filter(F.col("vec_id") < k_codes).select(
        F.col("vec_id").alias("code"), _as_double(F.col("embedding")).alias("v")
    )
    subs = base.sparkSession.range(m).select(F.col("id").cast("long").alias("sub"))
    return base.crossJoin(F.broadcast(subs)).select(
        "sub",
        "code",
        F.slice(F.col("v"), F.col("sub") * sub_dim + 1, sub_dim).alias("cv"),
    )


def _packed_codebook(codebook: DataFrame):
    """Materialize the codebook (a model: m*k rows) and pack it as ONE
    nested-array row [sub][code] -> centroid, for broadcast into
    shuffle-free per-row folds."""
    rows = codebook.collect()
    m = max(r["sub"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    packed = [[None] * k for _ in range(m)]
    for r in rows:
        packed[r["sub"]][r["code"]] = list(r["cv"])
    spark = codebook.sparkSession
    return spark.createDataFrame(
        [(packed,)], "cb: array<array<array<double>>>"
    ), m, k


def pq_encode(emb: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, codes): per subspace, the id of the nearest codebook
    centroid by squared L2 (strictly-smaller wins, so ties keep the
    LOWEST code — same semantics as ranking dist ASC, code ASC).
    Pure codegen fold over the broadcast packed codebook; the corpus
    never shuffles."""
    packed, m, k = _packed_codebook(codebook)
    sub_dim = DIM // m

    def best_code(sub: Column) -> Column:
        sv = F.slice(F.col("v"), sub * sub_dim + 1, sub_dim)
        codes_arr = F.element_at(F.col("cb"), (sub + 1).cast("int"))
        init = F.struct(
            F.lit(float("inf")).alias("d"), F.lit(-1).cast("long").alias("c")
        )

        def step(acc, pair):
            d = sq_dist(sv, pair["cv"])
            take = d < acc["d"]
            return F.when(
                take, F.struct(d.alias("d"), (pair["i"] - 1).cast("long").alias("c"))
            ).otherwise(acc)

        with_idx = F.transform(
            codes_arr, lambda cv, i: F.struct((i + 1).alias("i"), cv.alias("cv"))
        )
        return F.aggregate(with_idx, init, step)["c"]

    base = spread(emb).select("vec_id", _as_double(F.col("embedding")).alias("v"))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)), lambda s: best_code(s.cast("long"))
    )
    return base.crossJoin(F.broadcast(packed)).select(
        "vec_id", codes.alias("codes")
    )


def pq_topk(
    emb: DataFrame,
    codebook: DataFrame | None = None,
    query_pred: Column | None = None,
    query_ids: list[int] | None = None,
    k: int = 5,
) -> DataFrame:
    """PQ-ANN top-k via Asymmetric Distance Computation: full-precision
    broadcast queries against PQ codes. approx_dist sums the per-
    subspace (query, code) distances in explicit subspace order —
    deterministic and oracle-matchable. Ranking: approx_dist ASC,
    neighbor_id ASC (self excluded), via the partial top-k fold
    (`_topk_per_query` on the negated distance) — never a global
    window."""
    if codebook is None:
        codebook = pq_seed_codebook(emb)
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    packed, m, _k_codes = _packed_codebook(codebook)
    sub_dim = DIM // m

    queries = F.broadcast(
        emb.filter(query_pred).select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("qv"),
        )
    )
    codes = pq_encode(emb, codebook).select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )

    def sub_d(s: int) -> Column:
        qs = F.slice(F.col("qv"), s * sub_dim + 1, sub_dim)
        cv = F.element_at(
            F.element_at(F.col("cb"), s + 1),
            (F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        )
        return sq_dist(qs, cv)

    approx = sub_d(0)
    for s in range(1, m):
        approx = approx + sub_d(s)  # explicit subspace order, left-to-right

    sims = (
        queries.crossJoin(codes)
        .crossJoin(F.broadcast(packed))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            approx.alias("approx_dist"),
        )
        .withColumn("neg_dist", F.lit(0.0) - F.col("approx_dist"))
    )
    out = _topk_per_query(sims.select("query_id", "neighbor_id", F.col("neg_dist").alias("cos_sim")), k)
    return out.select(
        "query_id",
        "neighbor_id",
        (F.lit(0.0) - F.col("cos_sim")).alias("approx_dist"),
        "rank",
    )


def pq_codebook_kmeans(
    emb: DataFrame,
    m: int = PQ_M,
    k_codes: int = PQ_CODES,
    iters: int = KMEANS_ITERS,
    sample: int = KMEANS_SAMPLE,
) -> DataFrame:
    """Trained PQ codebook: per-subspace sampled Lloyd iterations with
    integer-snapped means (the `kmeans_centroids` discipline), seeded
    from the md5-ordered sample. One small training job per subspace —
    the codebook is a model, so the loop's cost is bounded by
    m * sample, not the corpus."""
    sub_dim = DIM // m
    base = spread(emb).select("vec_id", _as_double(F.col("embedding")).alias("v"))
    samp = base.orderBy(_sample_key(), "vec_id").limit(sample).persist()
    spark = emb.sparkSession
    try:
        all_rows = []
        for s in range(m):
            sub = samp.select(
                "vec_id", F.slice(F.col("v"), s * sub_dim + 1, sub_dim).alias("v")
            )
            seed = (
                sub.orderBy(_sample_key(), "vec_id")
                .limit(k_codes)
                .select(
                    (
                        F.row_number().over(Window.orderBy(_sample_key(), "vec_id"))
                        - 1
                    ).cast("long").alias("centroid_id"),
                    F.col("v").alias("cv"),
                )
            )
            cents = seed
            for _ in range(iters):
                cents = _int_mean_centroids(_assign_nearest(sub, cents))
            for r in cents.collect():
                all_rows.append((s, r["centroid_id"], list(r["cv"])))
        return spark.createDataFrame(
            all_rows, "sub: long, code: long, cv: array<double>"
        )
    finally:
        samp.unpersist()


# --- IVF-PQ composite (coarse quantizer + residual PQ + ADC) ---------------
#
# The production ANN stack (FAISS IVFPQ): a coarse quantizer routes
# each vector to one of C inverted lists, the RESIDUAL (vector minus
# its coarse centroid) is PQ-encoded, and a query scans only its
# n_probe nearest lists, scoring residual codes by ADC against the
# query's own residual per probed list. Memory per vector is PQ_M
# bytes + a list id; search cost is (n_probe / C) of the corpus.
#
# Geometry note: coarse assignment here is L2 (not the cosine used by
# the standalone IVF family) because residual encoding is a Euclidean
# construction — subtracting a cosine-nearest centroid would leave
# residual norms unbounded. Seed quantizers (first-N vectors, first-N
# residuals) keep the whole operator SQL-expressible for the oracle;
# kmeans_centroids / pq_codebook_kmeans are the trained drop-ins.


def sub_vec(a: Column, b: Column) -> Column:
    """Element-wise a - b (deterministic per-element IEEE subtract)."""
    return F.zip_with(a, b, lambda x, y: x - y)


def _assign_nearest_l2(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Map-side nearest-centroid assignment by squared L2: packed
    broadcast fold, strictly-smaller distance wins so ties keep the
    lowest centroid id (oracle mirror: ORDER BY dist, id). Same
    zero-shuffle shape as the cosine `_assign_nearest`."""
    packed = centroids.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("centroid_id", "cv"))).alias("_cents")
    )
    init = F.struct(
        F.lit(float("inf")).alias("d"), F.lit(-1).cast("long").alias("id")
    )

    def step(acc, c):
        d = sq_dist(F.col("v"), c["cv"])
        return F.when(
            d < acc["d"],
            F.struct(d.alias("d"), c["centroid_id"].cast("long").alias("id")),
        ).otherwise(acc)

    best = F.aggregate(F.col("_cents"), init, step)
    return vectors.crossJoin(F.broadcast(packed)).select(
        "vec_id", "v", best["id"].alias("centroid_id")
    )


def ivfpq_topk(
    emb: DataFrame,
    query_pred: Column | None = None,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_probe: int = 2,
    n_coarse: int = N_CENTROIDS,
) -> DataFrame:
    """IVF-PQ search: probe the ``n_probe`` L2-nearest coarse lists per
    query and rank their residual-PQ codes by ADC. Output
    (query_id, neighbor_id, approx_dist, rank); self excluded.

    Plan shape: coarse assignment and PQ encoding are zero-shuffle
    broadcast folds over the corpus; the probe table is |Q|·n_probe
    rows (broadcast); candidate scoring joins codes on the list id —
    an equi-join that touches only probed lists — and the final cut is
    the two-stage partial top-k. Nothing ever shuffles raw vectors.
    """
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])

    base = spread(emb).select("vec_id", _as_double(F.col("embedding")).alias("v"))
    coarse = F.broadcast(
        base.filter(F.col("vec_id") < n_coarse).select(
            F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
        )
    )
    assigned = _assign_nearest_l2(base, coarse)
    residuals = assigned.join(
        coarse.select(F.col("centroid_id"), F.col("cv").alias("_cv")),
        "centroid_id",
    ).select(
        "vec_id", "centroid_id", sub_vec(F.col("v"), F.col("_cv")).alias("v")
    )

    # residual codebook: residuals of the first PQ_CODES vectors
    seed_res = residuals.filter(F.col("vec_id") < PQ_CODES).select(
        F.col("vec_id").alias("code"), "v"
    )
    sub_dim = PQ_SUB_DIM
    subs = emb.sparkSession.range(PQ_M).select(F.col("id").cast("long").alias("sub"))
    codebook = seed_res.crossJoin(F.broadcast(subs)).select(
        "sub",
        "code",
        F.slice(F.col("v"), F.col("sub") * sub_dim + 1, sub_dim).alias("cv"),
    )
    packed_cb, m, _k = _packed_codebook(codebook)

    # encode every residual (same argmin fold as pq_encode, on residuals)
    def best_code(sub: Column) -> Column:
        sv = F.slice(F.col("v"), sub * sub_dim + 1, sub_dim)
        codes_arr = F.element_at(F.col("cb"), (sub + 1).cast("int"))
        init = F.struct(
            F.lit(float("inf")).alias("d"), F.lit(-1).cast("long").alias("c")
        )

        def step(acc, pair):
            d = sq_dist(sv, pair["cv"])
            return F.when(
                d < acc["d"],
                F.struct(d.alias("d"), (pair["i"] - 1).cast("long").alias("c")),
            ).otherwise(acc)

        with_idx = F.transform(
            codes_arr, lambda cv, i: F.struct((i + 1).alias("i"), cv.alias("cv"))
        )
        return F.aggregate(with_idx, init, step)["c"]

    codes_expr = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)), lambda s: best_code(s.cast("long"))
    )
    codes = residuals.crossJoin(F.broadcast(packed_cb)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("centroid_id"),
        codes_expr.alias("codes"),
    )

    # probe selection: |Q| x C scored rows (tiny — C is the coarse
    # count), rank n_probe per query by (dist, centroid_id)
    queries = base.filter(query_pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored_lists = queries.crossJoin(coarse).select(
        "query_id",
        "centroid_id",
        "qv",
        sq_dist(F.col("qv"), F.col("cv")).alias("cd"),
        sub_vec(F.col("qv"), F.col("cv")).alias("qres"),
    )
    wp = Window.partitionBy("query_id").orderBy("cd", "centroid_id")
    probes = F.broadcast(
        scored_lists.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "centroid_id", "qres")
    )

    def sub_d(s: int) -> Column:
        qs = F.slice(F.col("qres"), s * sub_dim + 1, sub_dim)
        cv = F.element_at(
            F.element_at(F.col("cb"), s + 1),
            (F.element_at(F.col("codes"), s + 1) + 1).cast("int"),
        )
        return sq_dist(qs, cv)

    approx = sub_d(0)
    for s in range(1, m):
        approx = approx + sub_d(s)

    sims = (
        probes.join(codes, "centroid_id")
        .crossJoin(F.broadcast(packed_cb))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.lit(0.0) - approx).alias("cos_sim"),
        )
    )
    out = _topk_per_query(sims, k)
    return out.select(
        "query_id",
        "neighbor_id",
        (F.lit(0.0) - F.col("cos_sim")).alias("approx_dist"),
        "rank",
    )


# --- GEMM-based brute-force scoring (Arrow/numpy matmul path) --------------


def brute_force_topk_gemm(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k like `brute_force_topk`, but scoring runs as
    ONE numpy matrix multiply per Arrow batch (corpus-batch × queryᵀ)
    instead of a per-row codegen fold — the throughput path when the
    query set is large enough that |Q| fused fold expressions stop
    fitting codegen budgets (hundreds+ of queries).

    Per partition: normalize the corpus batch rows, GEMM against the
    broadcast normalized query matrix, keep each batch's local top-k
    per query (bounded memory), then reduce with the global partial
    top-k. Scores differ from the fold path only in summation order
    (numpy uses SIMD/pairwise summation), i.e. last-ulp — which is why
    this variant has no SQL oracle; the fold path is the bit-exact
    reference and `tests/test_similarity.py` pins set-agreement
    between the two.
    """
    import numpy as np
    import pandas as pd

    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    q_rows = (
        emb.filter(query_pred)
        .select("vec_id", _as_double(F.col("embedding")).alias("v"))
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["v"] for r in q_rows], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    sc = emb.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, qn))

    schema = "query_id long, neighbor_id long, cos_sim double"

    def _batches(it):
        ids_b, qn_b = bq.value
        for pdf in it:
            if pdf.empty:
                continue
            nm = np.stack(pdf["embedding"].map(np.asarray).values).astype(np.float64)
            norms = np.linalg.norm(nm, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            sims = (nm / norms) @ qn_b.T  # |batch| x |Q|
            nids = pdf["vec_id"].values.astype(np.int64)
            top = min(k + 1, sims.shape[0])  # +1 allows dropping self
            for qi, qid in enumerate(ids_b):
                col = sims[:, qi]
                idx = np.argpartition(-col, top - 1)[:top]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": nids[idx],
                        "cos_sim": col[idx],
                    }
                )

    sims = spread(emb).select("vec_id", "embedding").mapInPandas(_batches, schema)
    sims = sims.filter(F.col("neighbor_id") != F.col("query_id"))
    return _topk_per_query(sims, k).orderBy("query_id", "rank")


def pool_chunk_embeddings(
    emb: DataFrame,
    group_col: str = "group_id",
    scale_bits: int = 20,
) -> DataFrame:
    """Mean-pool chunk embeddings into document embeddings — the
    aggregation step after a chunk-level embedding model runs (RAG
    indexing and doc-level SemDedup both consume pooled vectors). A
    naive float sum is partitioning-order-dependent; here each
    component is quantized to fixed point (x * 2^scale_bits, rounded),
    summed as BIGINT (order-free, exact), and the mean emitted as ONE
    division — bit-identical on any cluster layout, at the cost of
    2^-scale_bits quantization (1e-6 at 20 bits, far below fp32 noise).

    Emits one SCALAR row per (group, component): n_chunks, the exact
    integer sum, and the mean — long-format because pooled arrays
    would re-enter the float-array comparison surface this operator
    exists to avoid; the array re-assembly is a downstream
    collect_list the consumer does.

    Scale: posexplode is a map-side fan-out (64x rows, narrow), the
    one shuffle is the map-side-combined (group, pos) agg.
    """
    scale = 1 << scale_bits
    ex = spread(emb).select(
        F.col(group_col),
        F.posexplode(F.col("embedding")).alias("pos", "_x"),
    )
    q = F.floor(F.col("_x").cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast(
        "long"
    )
    return (
        ex.groupBy(group_col, "pos")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(q).cast("long").alias("sum_q"),
        )
        .select(
            group_col,
            F.col("pos").cast("long").alias("pos"),
            "n_chunks",
            "sum_q",
            (
                F.col("sum_q").cast("double")
                / (F.col("n_chunks") * F.lit(scale)).cast("double")
            ).alias("mean"),
        )
    )


def two_stage_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    query_pred: Column | None = None,
    k: int = 5,
    pool: int = 20,
) -> DataFrame:
    """Two-stage retrieval (the production serving pattern): a CHEAP
    int8-quantized scan selects a per-query candidate pool (4x less
    corpus I/O than float32 — `quantized_topk`'s stage), then exact
    float cosine reranks only the pool to the final top-k. Emits the
    coarse rank alongside the exact rank, so rerank movement (the
    quality the second stage buys) is visible in the output.

    Scale shape: stage 1 is the quantized broadcast-queries/
    corpus-streams scan with partial top-pool; stage 2 touches only
    |Q| x pool vectors — the full-precision corpus is read once for
    the pool join (id-equi-join, broadcastable: the pool is
    |Q| x pool ids), never scanned per query.
    """
    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids or [])
    coarse = quantized_topk(emb, query_pred=query_pred, k=pool).select(
        "query_id",
        "neighbor_id",
        F.col("rank").alias("coarse_rank"),
    )
    # float32 -> double BEFORE the fold (brute_force_topk's discipline:
    # a float32 zip_with fold diverges from the oracle's double fold in
    # the last ulps)
    vecs = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    paired = (
        F.broadcast(coarse)
        .join(
            vecs.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("nv"),
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                vecs.filter(query_pred).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"),
                )
            ),
            "query_id",
        )
    )
    sims = paired.select(
        "query_id",
        "neighbor_id",
        "coarse_rank",
        (
            dot(F.col("qv"), F.col("nv"))
            / (l2_norm(F.col("qv")) * l2_norm(F.col("nv")))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            "rank",
            F.col("coarse_rank").cast("long").alias("coarse_rank"),
        )
    )


def diversity_coreset(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    """Bucket-stratified diversity coreset: ONE representative per
    occupied SRP sign-bucket — the geometry-aware counterpart of
    uniform sampling (uniform keeps duplicates of dense regions;
    stratifying on the LSH partition guarantees every occupied corner
    of embedding space is represented once). SemDedup removes near-
    equal vectors; this SELECTS a spread subset — the shape used for
    seeding diverse eval sets or k-means-style inits without an
    iterative pass.

    Representative = min (md5 tiebroken by id) within the bucket:
    quality-blind, deterministic, and — because struct MIN combines
    map-side — the whole operator is ONE groupBy whose shuffle carries
    at most one candidate per (bucket, map task). No window over the
    corpus, no per-bucket sort.
    """
    planes = hyperplane_signs(num_planes)
    b = emb.select(
        F.col(id_col),
        lsh_bucket(_as_double(F.col(vec_col)), planes).alias("bucket"),
    )
    pick = F.min(
        F.struct(
            F.md5(F.concat(F.lit("div:"), F.col(id_col).cast("string"))).alias(
                "h"
            ),
            F.col(id_col).alias("i"),
        )
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("bucket_size"),
            pick.alias("m"),
        )
        .select("bucket", "bucket_size", F.col("m.i").alias("rep_id"))
    )


def rbo_weights(k: int, p: float) -> tuple[float, ...]:
    """Truncated rank-biased-overlap term weights (1-p) * p^(d-1) / d
    for d = 1..k (Webber et al. 2010, eq. 4 truncated at depth k) —
    computed ONCE in Python so both the Spark plan and any SQL oracle
    interpolate the SAME double literals (the k30/a35 transcendental-
    free discipline: p^(d-1) never evaluates engine-side)."""
    return tuple((1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1))


def rbo_overlap(
    a: DataFrame,
    b: DataFrame,
    k: int,
    p: float,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Truncated rank-biased overlap between two top-k rankings of the
    same query set: RBO_k = sum_{d=1..k} (1-p) p^(d-1) |A_:d ∩ B_:d|/d.

    The overlap-at-depth trick: an item common to both lists is inside
    BOTH depth-d prefixes iff max(rank_a, rank_b) <= d, so one
    id-equi-join of the two k-row-per-query rankings plus k conditional
    counts replaces any per-depth set intersection. The score is ONE
    fixed-shape expression tree over integer overlap counts and
    Python-literal weights — no engine-side powers, no unordered float
    SUM, so it is bit-reproducible across engines.

    Queries present in ``a`` but sharing no item with ``b`` score 0.0
    (left join + coalesce). Scale shape: both inputs are k rows per
    query by construction, so the join and groupBy shuffle O(k x
    n_queries) rows regardless of corpus size.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1)")
    w = rbo_weights(k, p)
    qa = [query_col, item_col]
    j = (
        a.select(*qa, F.col(rank_col).alias("_ra"))
        .join(b.select(*qa, F.col(rank_col).alias("_rb")), qa)
        .select(query_col, F.greatest("_ra", "_rb").alias("m"))
    )
    o_aggs = [
        F.count(F.when(F.col("m") <= d, F.lit(1))).cast("long").alias(f"o{d}")
        for d in range(1, k + 1)
    ]
    o = j.groupBy(query_col).agg(*o_aggs)
    score = None
    for d, wd in enumerate(w, start=1):
        term = F.col(f"o{d}").cast("double") * F.lit(wd)
        score = term if score is None else score + term
    qs = a.select(query_col).distinct()
    return qs.join(o, query_col, "left").select(
        query_col,
        F.coalesce(F.col(f"o{k}"), F.lit(0)).cast("long").alias("n_common"),
        F.coalesce(score, F.lit(0.0)).alias("rbo"),
    )


def pq_distortion(emb: DataFrame, codebook: DataFrame) -> DataFrame:
    """Per-vector product-quantization reconstruction error — the
    standard codebook-quality eval (Jegou et al. 2011 report it as the
    curve every PQ design trades against recall): for each subspace
    the error is the squared L2 to the NEAREST code (exactly what ADC
    loses vs exact search), and the vector's distortion is the sum
    over subspaces in ascending-subspace order.

    Float discipline: min over doubles is exact; the cross-subspace
    sum is a fixed-shape LEFT fold seeded at 0.0 ((((0+d0)+d1)+d2)+d3
    for m=4), so an oracle writing `0.0 + s0 + s1 + ...` reproduces it
    bit-for-bit. No cross-ROW float aggregation anywhere — the output
    is per-vector.

    Scale shape: the codebook is a model (m x k rows) packed and
    broadcast exactly as ``pq_encode``; the corpus pays one codegen
    fold per row and never shuffles. Returns (vec_id, sq_err).
    """
    packed, m, _k = _packed_codebook(codebook)
    sub_dim = DIM // m

    def best_d(sub: Column) -> Column:
        sv = F.slice(F.col("v"), sub * sub_dim + 1, sub_dim)
        codes_arr = F.element_at(F.col("cb"), (sub + 1).cast("int"))

        def step(acc, cv):
            d = sq_dist(sv, cv)
            return F.when(d < acc, d).otherwise(acc)

        return F.aggregate(codes_arr, F.lit(float("inf")), step)

    base = spread(emb).select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    total = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: best_d(s.cast("long")),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    return base.crossJoin(F.broadcast(packed)).select(
        "vec_id", total.alias("sq_err")
    )


def ivf_recall_curve(
    emb: DataFrame,
    query_pred: Column,
    probes: tuple[int, ...] = (1, 2, 4),
    k: int = 5,
    n_centroids: int = N_CENTROIDS,
) -> DataFrame:
    """Recall@k of IVF search at several ``n_probe`` settings against
    brute-force truth, as ONE plan: the corpus is assigned to inverted
    lists ONCE, candidates are gathered once at max(probes) carrying
    their probe rank, and each setting's top-k is a rank over the
    SAME candidate frame filtered to ``_pr <= p`` (probe candidate
    sets are nested in p, so nothing is recomputed). Contrast with
    invoking ``ivf_topk`` per setting, which would re-shuffle the
    corpus per point on the curve.

    Exact float: recall = integer hit count / literal k. Returns
    (n_probe, query_id, n_hits, recall) for every (setting, query)
    pair, zero-hit queries included.
    """
    p_max = max(probes)
    centroids = _centroids(emb, n_centroids)
    assigned = ivf_assign(emb, centroids=centroids).persist()
    cands = None
    try:
        queries = assigned.filter(query_pred).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.col("p_sim").desc(), F.col("centroid_id")
        )
        probe_lists = F.broadcast(
            queries.crossJoin(centroids)
            .select(
                "query_id",
                "qv",
                "centroid_id",
                (
                    dot(F.col("qv"), F.col("cv"))
                    / (l2_norm(F.col("qv")) * l2_norm(F.col("cv")))
                ).alias("p_sim"),
            )
            .withColumn("_pr", F.row_number().over(wq))
            .filter(F.col("_pr") <= p_max)
            .select(
                "query_id", "qv", F.col("centroid_id").alias("qc"), "_pr"
            )
        )
        cands = (
            probe_lists.join(assigned, F.col("qc") == assigned["centroid_id"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (
                    dot(F.col("qv"), F.col("v"))
                    / (l2_norm(F.col("qv")) * l2_norm(F.col("v")))
                ).alias("cos_sim"),
                "_pr",
            )
            .persist()
        )
        truth = brute_force_topk(emb, query_pred=query_pred, k=k).select(
            "query_id", "neighbor_id"
        )
        appx = None
        for p in probes:
            wr = Window.partitionBy("query_id").orderBy(
                F.col("cos_sim").desc(), F.col("neighbor_id")
            )
            ap = (
                cands.filter(F.col("_pr") <= p)
                .withColumn("_rk", F.row_number().over(wr))
                .filter(F.col("_rk") <= k)
                .select(
                    F.lit(p).cast("long").alias("n_probe"),
                    "query_id",
                    "neighbor_id",
                )
            )
            appx = ap if appx is None else appx.unionByName(ap)
        hits = (
            appx.join(truth, ["query_id", "neighbor_id"])
            .groupBy("n_probe", "query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
        settings = appx.select("n_probe").distinct()
        base = truth.select("query_id").distinct().crossJoin(
            F.broadcast(settings)
        )
        out = base.join(hits, ["n_probe", "query_id"], "left").select(
            "n_probe",
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall"),
        )
        # settings x |Q| rows — eager, so both corpus caches release
        return out.localCheckpoint(eager=True)
    finally:
        if cands is not None:
            cands.unpersist()
        assigned.unpersist()


def prefix_recall_curve(
    emb: DataFrame,
    query_pred: Column,
    dims: tuple[int, ...] = (8, 16, 32),
    k: int = 5,
) -> DataFrame:
    """Recall@k of BRUTE-FORCE cosine over embedding PREFIXES vs the
    full-dimension truth — the Matryoshka (MRL) truncation-quality
    curve: how much ranking quality each prefix length retains decides
    the serve-time dim/cost point. ONE plan: a single query-broadcast
    corpus pass computes every prefix cosine side by side (slices of
    the same row — no per-dim rescan), each dim's top-k ranks its own
    column, and all settings share one brute-force truth.

    Exact float: per-pair cosines are fixed-shape ascending-dim folds
    (same discipline as brute_force_topk); recall = integer hit count
    / literal k. Returns (dim, query_id, n_hits, recall).
    """
    queries = F.broadcast(
        emb.filter(query_pred).select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("qv"),
        )
    )
    corpus = spread(emb).select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("nv"),
    )
    sims_cols = [
        (
            dot(F.slice("qv", 1, d), F.slice("nv", 1, d))
            / (
                l2_norm(F.slice("qv", 1, d))
                * l2_norm(F.slice("nv", 1, d))
            )
        ).alias(f"cos_{d}")
        for d in dims
    ]
    pairs = (
        queries.crossJoin(corpus)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", *sims_cols)
        .persist()
    )
    try:
        truth = brute_force_topk(emb, query_pred=query_pred, k=k).select(
            "query_id", "neighbor_id"
        )
        appx = None
        for d in dims:
            wr = Window.partitionBy("query_id").orderBy(
                F.col(f"cos_{d}").desc(), F.col("neighbor_id")
            )
            ap = (
                pairs.withColumn("_rk", F.row_number().over(wr))
                .filter(F.col("_rk") <= k)
                .select(
                    F.lit(d).cast("long").alias("dim"),
                    "query_id",
                    "neighbor_id",
                )
            )
            appx = ap if appx is None else appx.unionByName(ap)
        hits = (
            appx.join(truth, ["query_id", "neighbor_id"])
            .groupBy("dim", "query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
        settings = appx.select("dim").distinct()
        base = truth.select("query_id").distinct().crossJoin(
            F.broadcast(settings)
        )
        out = base.join(hits, ["dim", "query_id"], "left").select(
            "dim",
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        pairs.unpersist()
