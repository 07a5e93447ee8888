"""SimHash near-duplicate detection (Charikar 2002, the Google-crawl
near-dup scheme from Manku et al., WWW 2007).

The 64-bit signature is computed in a vectorized Pandas UDF (Arrow
batches — the sanctioned slow path; per-token md5 bit-voting has no
native Spark expression). Everything AFTER signature computation is
native DataFrame ops:

- near-pair candidate generation splits the 64-bit signature into 4
  16-bit bands and self-joins on band equality — by pigeonhole, any
  pair with Hamming distance <= 3 shares at least one intact band, so
  recall is 100% at the d<=3 design point (same rotate-and-block idea
  as Manku et al.).
- exact Hamming verify = bit_count(a XOR b), a codegen'd long op.

Scale: signatures are 8 bytes/doc; the band join shuffles (16-bit key,
id) pairs. Deterministic md5 hashing -> stable across runs/engines.
Token hashes are the LITTLE-endian uint64 of the first 8 md5 digest
bytes — exactly DuckDB's ``md5_number_upper`` — so the whole pipeline
(bit-voting signature, band split, Hamming verify) mirrors into the
DuckDB oracle bit-for-bit (see queries/text_pipeline.py SIMHASH_ORACLE).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from group_2_shopware_enterprise_data_engineering_project_spark.functions.partitioning import spread
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BIT_IDX = np.arange(64, dtype=np.uint64)


def _simhash64(text: str) -> int:
    """Vectorized bit-voting: token hashes -> (n_tok, 64) bit matrix ->
    per-bit vote sum, all in numpy (the per-token-per-bit Python loop
    was ~50x slower)."""
    toks = [t for t in (text or "").split(" ") if t]
    if not toks:
        return 0
    hashes = np.frombuffer(
        b"".join(hashlib.md5(t.encode("utf-8")).digest()[:8] for t in toks),
        dtype="<u8",  # little-endian == DuckDB md5_number_upper (oracle parity)
    ).astype(np.uint64)
    bits = (hashes[:, None] >> _BIT_IDX) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    sig = int(((votes > 0).astype(np.uint64) << _BIT_IDX).sum())
    # two's-complement into signed int64 for Spark LongType
    return sig - (1 << 64) if sig >= (1 << 63) else sig


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_simhash64)


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    docs = spread(docs)
    return docs.select(F.col(id_col).alias("doc_id"), simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    4 x 16-bit band join guarantees full recall for max_hamming <= 3;
    larger distances would need more/rotated bands.
    """
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col("simhash"), b * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_key"),
            )
            for b in range(4)
        ]
    )
    exploded = sigs.select(
        "doc_id", "simhash", F.explode(bands).alias("band")
    ).select(
        "doc_id",
        "simhash",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
    )
    # No terminal global sort on the (potentially huge) pair list.
    return pairs.filter(F.col("hamming") <= max_hamming)


def simhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    # Persist: the band self-join references the signature DF on both
    # sides, which would run the Pandas UDF twice over the corpus.
    # Released on return — the result (id pairs + distance, no text)
    # is eagerly materialized first, so the corpus-sized signature
    # cache never outlives this call.
    sigs = simhash_signatures(docs, text_col, id_col).persist()
    try:
        return simhash_near_pairs(sigs, max_hamming).localCheckpoint(eager=True)
    finally:
        sigs.unpersist()
