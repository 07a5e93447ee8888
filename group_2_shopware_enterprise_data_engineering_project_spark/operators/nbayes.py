"""Bernoulli Naive Bayes text classifier — training AND inference as
pure DataFrame operations.

The quality-classifier stage of a curation pipeline (fastText-style
lang/quality gating) without leaving the engine: training is exact
integer counting (one shuffle), the model is a broadcastable
(class, term, p) table, and scoring is a codegen fold per document —
no mllib, no Python loop, no model file.

Determinism discipline: NB is usually scored as Σ log p, but ln is
not bit-identical across engines (see text.tfidf_top_terms). With a
small feature vocabulary the raw probability product never
underflows (16 factors ≥ 1/(N_c+2) each), so scores multiply the
factors DIRECTLY in a fixed (term-sorted) fold order — IEEE
multiplication is exactly rounded, so Spark and the SQL oracle
produce the same bits. Ties break to the lexicographically first
class.

Scale shape: training shuffles (class, term, count) pairs only; the
model is |classes|·|vocab| rows (a broadcast literal); inference is
one map over the corpus with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators.text import (
    tokens,
)


def nb_train(
    docs: DataFrame,
    vocab: Sequence[str],
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Train per-(class, term) Bernoulli likelihoods with Laplace
    smoothing: p = (df_ct + 1) / (N_c + 2), plus the class prior
    N_c / N. Every count is exact; both divisions are single IEEE
    ops. Returns (label, term, p, prior) — the model."""
    if not vocab:
        raise ValueError("vocab must be non-empty")
    v = sorted(set(vocab))
    toks = docs.select(
        F.col(label_col).alias("label"), tokens(text_col).alias("_t")
    )
    n_total = docs.count()
    per_class = toks.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    vocab_df = docs.sparkSession.createDataFrame(
        [(t,) for t in v], "term: string"
    )
    df_ct = (
        toks.crossJoin(F.broadcast(vocab_df))
        .groupBy("label", "term")
        .agg(
            F.sum(
                F.when(F.array_contains(F.col("_t"), F.col("term")), 1).otherwise(0)
            )
            .cast("long")
            .alias("df_ct")
        )
    )
    return (
        df_ct.join(F.broadcast(per_class), "label")
        .select(
            "label",
            "term",
            (
                (F.col("df_ct").cast("double") + F.lit(1.0))
                / (F.col("n_c").cast("double") + F.lit(2.0))
            ).alias("p"),
            (F.col("n_c").cast("double") / F.lit(float(n_total))).alias("prior"),
        )
    )


def _packed_model(model: DataFrame):
    """Materialize the model (|classes|·|vocab| rows) and pack it as
    one broadcast row: array over classes (label-sorted) of
    (label, prior, terms[term-sorted] of (term, p))."""
    rows = model.collect()
    by_class: dict[str, dict] = {}
    for r in rows:
        c = by_class.setdefault(r["label"], {"prior": r["prior"], "terms": []})
        c["terms"].append((r["term"], r["p"]))
    packed = [
        (label, d["prior"], sorted(d["terms"]))
        for label, d in sorted(by_class.items())
    ]
    spark = model.sparkSession
    return spark.createDataFrame(
        [(packed,)],
        "model: array<struct<label:string, prior:double, "
        "terms:array<struct<term:string, p:double>>>>",
    )


def nb_predict(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str | None = "lang",
) -> DataFrame:
    """Score every document against every class and keep the argmax.

    score(c) = prior_c · Π_{t in vocab} (p_ct if t ∈ doc else 1−p_ct),
    folded in term-sorted order (bit-deterministic). Argmax keeps the
    strictly-greater score, so ties go to the first (sorted) class —
    the oracle ranks score DESC, label ASC. Zero-shuffle map over the
    corpus; if ``label_col`` is given, a `correct` flag is added."""
    packed = _packed_model(model)

    def class_score(cls: Column) -> Column:
        factor = lambda t: F.when(  # noqa: E731
            F.array_contains(F.col("_t"), t["term"]), t["p"]
        ).otherwise(F.lit(1.0) - t["p"])
        prod = F.aggregate(
            cls["terms"], F.lit(1.0), lambda acc, t: acc * factor(t)
        )
        return cls["prior"] * prod

    init = F.struct(
        F.lit(-1.0).cast("double").alias("score"),
        F.lit(None).cast("string").alias("label"),
    )

    def step(acc, cls):
        s = class_score(cls)
        return F.when(
            s > acc["score"],
            F.struct(s.alias("score"), cls["label"].alias("label")),
        ).otherwise(acc)

    best = F.aggregate(F.col("model"), init, step)
    out = (
        docs.select(
            F.col(id_col),
            *([F.col(label_col)] if label_col else []),
            tokens(text_col).alias("_t"),
        )
        .crossJoin(F.broadcast(packed))
        .select(
            id_col,
            *([label_col] if label_col else []),
            best["label"].alias("predicted"),
            best["score"].alias("score"),
        )
    )
    if label_col:
        out = out.withColumn(
            "correct", F.col("predicted") == F.col(label_col)
        )
    return out
