"""Distributed connected components: the clustering step that turns
near-duplicate PAIRS into dedup verdicts (one kept representative per
cluster of mutual near-dups).

Spark has no built-in CC (GraphX is Scala-only, GraphFrames is an
external package), so this is iterative min-label propagation on
DataFrames: every node repeatedly adopts the smallest label among
itself and its neighbors until fixpoint. Rounds needed = graph
diameter; near-dup graphs are unions of small dense clusters (pairs,
triangles, small stars), so convergence is 2-4 rounds in practice.
For adversarial long-chain graphs the alternating large-star/small-star
scheme (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) drops rounds to O(log n); the propagation step
below is its building block.

Scale notes: each round is one join (labels onto edge endpoints — the
edge list shuffles on src, the labels on id) plus one min-groupBy with
map-side combine. Labels are (id, label) longs only — never payloads.
The loop's lineage is cut by localCheckpoint every ``checkpoint_every``
rounds (unbounded lineage would make round k replay rounds 1..k-1);
the per-round convergence test is a count() action over the changed
set, O(1) result on the driver (the standard distributed-CC stopping
rule — not a data collect).

No counterpart in the reference (its dedup is single-batch
drop_duplicates, pos_transform.py); this is the beyond-reference
completion of the MinHash/SimHash family: pairs -> clusters -> keep
list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    ``edges`` (undirected). Returns (id, cluster_rep).

    ``nodes`` may contain ids absent from ``edges`` — they come back
    as singleton clusters (cluster_rep == id), which is what a dedup
    keep-list wants: every document gets a verdict.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).persist()

    try:
        for i in range(max_iter):
            # neighbors' labels flow along edges; min with own label
            msgs = sym.join(labels, sym["a"] == labels["id"]).select(
                F.col("b").alias("id"), "label"
            )
            new_labels = (
                labels.union(msgs).groupBy("id").agg(F.min("label").alias("label"))
            )
            if (i + 1) % checkpoint_every == 0:
                new_labels = new_labels.localCheckpoint(eager=False)
            new_labels = new_labels.persist()

            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
        return labels.select("id", F.col("label").alias("cluster_rep"))
    finally:
        sym.unpersist()


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.union(
        edges.select(F.col("a").alias("b"), F.col("b").alias("a")).select("a", "b")
    ).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al. 2014): every node links its LARGER
    neighbors to the minimum of its neighborhood (incl. itself).
    Emits (v, m) for v in N(u), v > u, with m = min(N(u) + {u})."""
    sym = _symmetric(edges)
    mins = sym.groupBy("a").agg(F.min("b").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("a")).alias("_m")
    return (
        sym.join(mins, "a")
        .select("a", "b", m)
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient every edge large->small, then link each
    node's smaller neighbors (and itself) to the neighborhood min."""
    oriented = (
        edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("_m"))  # all b < a
    withm = oriented.join(mins, "a")
    to_nbrs = withm.filter(F.col("b") != F.col("_m")).select(
        F.col("b").alias("a"), F.col("_m").alias("b")
    )
    to_self = mins.select(F.col("a"), F.col("_m").alias("b"))
    return to_nbrs.union(to_self).distinct()


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 40,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014): converges in O(log n) rounds on ANY graph — the
    upgrade over min-label propagation (O(diameter) rounds) for
    adversarial long-chain graphs. Same contract as
    ``connected_components``: (id, cluster_rep) with rep = min id.

    Per round: two groupBy-min + two joins over an edge list that only
    shrinks toward the final star form; ids only, never payloads.
    Convergence test = the star edge set reaching a fixpoint
    (large-star output == its input), checked with an O(1)-result
    count over the symmetric difference.
    """
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    for i in range(max_iter):
        new_e = _small_star(_large_star(e))
        if (i + 1) % checkpoint_every == 0:
            new_e = new_e.localCheckpoint(eager=False)
        new_e = new_e.persist()
        changed = (
            new_e.exceptAll(e).limit(1).count()
            + e.exceptAll(new_e).limit(1).count()
        )
        e.unpersist()
        e = new_e
        if changed == 0:
            break
    else:
        raise RuntimeError(f"star CC did not converge in {max_iter} rounds")

    # final form: (child, root) star edges; roots + untouched nodes map
    # to themselves
    stars = e.select(F.col("a").alias("id"), F.col("b").alias("cluster_rep"))
    out = (
        nodes.select(F.col(id_col).alias("id"))
        .join(stars, "id", "left")
        .select(
            "id", F.coalesce("cluster_rep", F.col("id")).alias("cluster_rep")
        )
    )
    e.unpersist()
    return out


def dedup_verdicts(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    use_star: bool = False,
) -> DataFrame:
    """Near-dup pairs -> per-document dedup verdict: cluster
    representative (min doc_id in the connected cluster) and a keep
    flag (representative survives, other members drop). Documents in
    no pair keep themselves.

    ``use_star=True`` routes through the alternating large-star/
    small-star variant (O(log n) rounds on ANY graph) — the switch for
    graphs whose diameter is not known to be small; the default
    min-label propagation wins on near-dup graphs (diameter 2-4, fewer
    shuffles per round). Identical output either way (property-tested).
    """
    algo = connected_components_star if use_star else connected_components
    cc = algo(
        docs.select(id_col),
        pairs.select(pair_a, pair_b),
        id_col=id_col,
        src_col=pair_a,
        dst_col=pair_b,
    )
    return cc.select(
        F.col("id").alias(id_col),
        "cluster_rep",
        (F.col("id") == F.col("cluster_rep")).alias("is_keep"),
    )
