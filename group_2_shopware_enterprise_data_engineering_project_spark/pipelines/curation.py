"""End-to-end LLM corpus curation: the flagship composition of the
training-data operator family over one pass of the corpus.

    documents
      -> exact dedup        (md5 fingerprint, keep min doc_id)
      -> near-dup clusters  (MinHash-LSH pairs -> connected components,
                             keep cluster representative)
      -> quality gate       (4-check score == 4)
      -> repetition gate    (Gopher-style within-doc repetition keep)
      -> split assignment   (hash-stable 90/5/5 train/val/test)

This is the pipeline shape of a pretraining data refresh (the
reference's pipelines stop at KPI aggregation; curation is the
beyond-reference continuation). Every stage is itself oracle-verified
standalone (t4, dedup_minhash_lsh + m8, t2, m1); the composed query
(pipe_llm_curation) verifies the END-TO-END dataflow bit-for-bit.

Scale shape: the expensive stage is MinHash-LSH (one band-bucket
shuffle over (band_hash, doc_id) pairs); everything else is hash
groupBys and semi joins on doc_id. Each stage's survivor set only
shrinks, so later stages run on less data — the composition never
re-reads the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    minhash,
    prep,
    text,
)
from group_2_shopware_enterprise_data_engineering_project_spark.operators.components import (
    dedup_verdicts,
)


def _gate_sets(
    docs: DataFrame, jaccard_threshold: float, materialize: bool
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """ONE copy of the curation gate chain, shared by `curate_corpus`
    and `curation_audit` so the audit's 'kept' label can never drift
    from the survivor set (a threshold tweak or a new stage reaches
    both callers by construction). Returns per-stage keep frames:

      exact     (doc_id)                          exact-dedup survivors
      keep2     (doc_id)                          near-dup cluster reps
      passed    (doc_id, n_tokens, quality_score) quality-gate passers
      rep_keep  (doc_id)                          repetition-gate keeps

    Each stage runs only on the previous stage's survivors. With
    ``materialize`` each id set is eagerly checkpointed — required
    when a caller consumes a set in MORE than one plan branch (the
    audit's attribution joins), where lazy plans would re-execute the
    whole upstream chain per branch."""
    mat = (
        (lambda d: d.localCheckpoint(eager=True)) if materialize else (lambda d: d)
    )
    exact = mat(text.exact_dedup(docs).select(F.col("keep_id").alias("doc_id")))
    surv1 = docs.join(exact, "doc_id", "semi")

    pairs = minhash.minhash_lsh_dedup(surv1, threshold=jaccard_threshold)
    verdicts = dedup_verdicts(surv1, pairs.select("doc_a", "doc_b"))
    keep2 = mat(verdicts.filter(F.col("is_keep")).select("doc_id"))
    surv2 = surv1.join(keep2, "doc_id", "semi")

    scored = text.quality_score(text.text_stats(surv2))
    passed = mat(
        scored.filter(F.col("is_quality")).select(
            "doc_id", "n_tokens", "quality_score"
        )
    )
    q_docs = surv2.join(passed.select("doc_id"), "doc_id", "semi")
    rep_keep = mat(
        text.repetition_signals(q_docs)
        .filter(F.col("repetition_keep"))
        .select("doc_id")
    )
    return exact, keep2, passed, rep_keep


def curate_corpus(docs: DataFrame, jaccard_threshold: float = 0.4) -> DataFrame:
    """Run the full curation pass; returns the surviving corpus as
    (doc_id, n_tokens, quality_score, split). Gate chain in
    `_gate_sets` (shared with `curation_audit`), run MATERIALIZED:
    the chain is linear stage-to-stage but each intermediate survivor
    frame feeds multiple plan branches (surv1 -> pairs AND verdicts
    AND surv2; surv2 -> scoring AND the repetition gate), so the lazy
    plan re-executed the upstream chain per branch — 326 exchanges at
    plan time vs 4 materialized, and measurably slower at sf0.1. The
    id sets are survivor-sized; at corpus scale they are the cheap
    thing to persist."""
    _, _, passed, rep_keep = _gate_sets(docs, jaccard_threshold, materialize=True)
    survivors = passed.join(rep_keep, "doc_id", "semi")
    # hash-stable split assignment
    return prep.split_assign(survivors, "doc_id").select(
        "doc_id", "n_tokens", "quality_score", "split"
    )


def curate_and_pack(
    docs: DataFrame,
    cap: int = 1024,
    shards: int = 8,
    jaccard_threshold: float = 0.4,
) -> DataFrame:
    """Curation v2: the full `curate_corpus` pass (exact dedup ->
    near-dup clusters -> quality + repetition gates -> split), then the
    writer-facing LAYOUT stages over the surviving corpus — sequence
    packing (concat-and-chunk pack ids per `prep.sequence_pack`) — so
    the output is directly consumable by a tokenize-and-shard writer:
    one row per surviving doc with (split, shard, pack_id, pack_offset,
    spans_boundary) alongside the curation columns.

    Scale: packing runs only on survivors (each curation stage shrinks
    the set), sharded by doc_id %% shards so no global single-task
    window exists; the join back to curation columns is a doc_id
    equi-join between two survivor-sized frames.
    """
    # the curated frame feeds TWO plan branches (survivor semi-join +
    # final column join); materialize once or the whole curation chain
    # (dedup, gates, split) re-executes per branch — at corpus scale
    # that doubles the dominant cost. Survivor-sized (ids + scalars).
    curated = curate_corpus(docs, jaccard_threshold).localCheckpoint(eager=True)
    surv_docs = docs.join(curated.select("doc_id"), "doc_id", "semi")
    packed = prep.sequence_pack(surv_docs, cap=cap, shards=shards)
    return curated.join(packed.drop("n_tokens"), "doc_id").select(
        "doc_id",
        "n_tokens",
        "quality_score",
        "split",
        "shard",
        "pack_id",
        "pack_offset",
        "spans_boundary",
    )


def curation_audit(docs: DataFrame, jaccard_threshold: float = 0.4) -> DataFrame:
    """Drop-attribution audit of the `curate_corpus` cascade: EVERY
    input document labeled with the FIRST stage that dropped it
    ('exact_dup' | 'near_dup' | 'quality' | 'repetition') or 'kept'.
    curate_corpus answers "what survived"; this answers the question a
    curation review actually asks — "where did the other 40% go" — at
    the cost of the same single corpus pass: the gate chain is the
    SHARED `_gate_sets` (so the 'kept' label equals the survivor set
    by construction, pinned by the partition-law pytest), run with
    ``materialize=True`` because each id set here feeds BOTH the next
    stage and a final attribution branch — lazy plans would re-execute
    the whole upstream chain per branch. All four sets are
    doc_id-sized."""
    exact, keep2, passed, rep_keep = _gate_sets(
        docs, jaccard_threshold, materialize=True
    )

    def _mark(ids: DataFrame, flag: str) -> DataFrame:
        return ids.select("doc_id").withColumn(flag, F.lit(1))

    return (
        docs.select("doc_id")
        .join(_mark(exact, "_e"), "doc_id", "left")
        .join(_mark(keep2, "_v"), "doc_id", "left")
        .join(_mark(passed, "_q"), "doc_id", "left")
        .join(_mark(rep_keep, "_r"), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_e").isNull(), F.lit("exact_dup"))
            .when(F.col("_v").isNull(), F.lit("near_dup"))
            .when(F.col("_q").isNull(), F.lit("quality"))
            .when(F.col("_r").isNull(), F.lit("repetition"))
            .otherwise(F.lit("kept"))
            .alias("drop_stage"),
        )
    )
