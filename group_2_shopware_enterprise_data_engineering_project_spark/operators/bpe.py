"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding merges are learned from PAIR FREQUENCIES, and the
classic scaling insight makes this cheap at any corpus size: training
never touches the corpus per iteration — it runs on the word-frequency
table (distinct words + counts), which is orders of magnitude smaller
than the text and FIXED across iterations. The 100 TB corpus is read
once (one explode + groupBy to build word counts); each of the k merge
iterations then processes |vocab| rows.

Per iteration:
  1. pair counts — explode each word's adjacent symbol pairs weighted
     by word count (native zip/explode, map-side combined),
  2. best pair — max count, ties broken lexicographically (a, b): a
     one-row TakeOrderedAndProject collect — the merge table is a
     MODEL, so driver materialization is the same contract as
     k-means centroids,
  3. merge application — rewrite the |vocab| symbol arrays via an
     Arrow-batched pandas UDF (adjacent-pair rewriting is inherently
     sequential per word; the batch is vocab-sized, not corpus-sized).

Determinism: counts are exact integers, ties are ordered, and the
merge rewrite is a pure function — same corpus, same merges, every
run and engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from group_2_shopware_enterprise_data_engineering_project_spark.operators.text import (
    tokens,
)

END = "</w>"


def _merge_series(symbols: pd.Series, a: str, b: str) -> pd.Series:
    merged = a + b

    def apply_one(syms):
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    return symbols.map(apply_one)


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count, symbols) — the word-frequency training table.
    symbols = characters + the end-of-word marker."""
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    return words.withColumn(
        "symbols", F.concat(chars, F.array(F.lit(END)))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns [(left, right,
    pair_count)] in merge order. Stops early when no pair reaches
    ``min_count``."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab = word_vocab(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    merges: list[tuple[str, str, int]] = []
    merge_udf_schema = T.ArrayType(T.StringType())
    try:
        for _ in range(n_merges):
            pairs = (
                vocab.select(
                    "count",
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                            F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                        )
                    ).alias("p"),
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("count").alias("n"))
            )
            top = (
                pairs.orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_count:
                break
            a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
            merges.append((a, b, n))

            def _make_udf(_a: str, _b: str):
                @F.pandas_udf(merge_udf_schema)
                def apply_merge(s: pd.Series) -> pd.Series:
                    return _merge_series(s, _a, _b)

                return apply_merge

            apply_merge = _make_udf(a, b)
            new_vocab = vocab.withColumn(
                "symbols", apply_merge(F.col("symbols"))
            ).persist(StorageLevel.MEMORY_AND_DISK)
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
        return merges
    finally:
        vocab.unpersist()


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge table: per word, apply
    every merge in training order. One Arrow-batched pass over the
    corpus (the merge list is a broadcast closure constant); returns
    (doc_id, n_tokens, tokens) with tokens comma-joined for
    scalar-stable comparison."""
    order = [(a, b) for a, b, _ in merges]

    schema = "doc_id long, n_tokens long, tokens string"

    def _batches(it):
        for pdf in it:
            toks_out = []
            for text in pdf[text_col].fillna(""):
                syms_all: list[str] = []
                for word in [w for w in text.split(" ") if w]:
                    syms = list(word) + [END]
                    for a, b in order:
                        merged = a + b
                        out = []
                        i = 0
                        while i < len(syms):
                            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                                out.append(merged)
                                i += 2
                            else:
                                out.append(syms[i])
                                i += 1
                        syms = out
                    syms_all.extend(syms)
                toks_out.append(syms_all)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_tokens": [len(t) for t in toks_out],
                    "tokens": [",".join(t) for t in toks_out],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(_batches, schema)
