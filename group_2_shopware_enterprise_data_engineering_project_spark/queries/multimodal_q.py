"""Multimodal queries with DuckDB oracles.

No media testdata table exists, so each query synthesizes a
deterministic media table from `documents` (payload = utf8 text bytes,
metadata derived from n_chars) and pushes it through the real operator
path — binary columns, metadata structs, Arrow-batched decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
    multimodal,
    rangejoin,
)
from group_2_shopware_enterprise_data_engineering_project_spark.registry import register
from group_2_shopware_enterprise_data_engineering_project_spark.sources import table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media table: payload = encode(text), kind cycles
    image/audio/video, meta derived from n_chars."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            (F.col("n_chars") * 40).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


MM1_ORACLE = """
SELECT md5(text) AS fingerprint,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1
"""


@register(
    "mm1_media_fingerprint",
    MM1_ORACLE,
    doc="exact media dedup on md5(payload bytes) — payloads stay "
    "JVM-side; only 16-byte digests shuffle",
)
def mm1_media_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.media_fingerprint(_media(spark, sf_dir))
    return media.groupBy("fingerprint").agg(
        F.min("media_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


MM2_ORACLE = """
SELECT doc_id AS media_id,
       CAST(gs.f AS BIGINT) AS frame_idx,
       CAST(gs.f * 1000 AS BIGINT) AS frame_ms
FROM documents,
     LATERAL (SELECT unnest(generate_series(0,
         CAST(floor((n_chars * 40 - 1) / 1000.0) AS BIGINT))) AS f) gs
WHERE n_chars > 0
"""


@register(
    "mm2_frame_sample",
    MM2_ORACLE,
    doc="video frame-sampling plan: one row per 1s frame from "
    "meta.duration_ms via sequence+explode — pure metadata math, no "
    "payload access",
)
def mm2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.frame_sample_plan(_media(spark, sf_dir), every_ms=1000)


def _feature_sql(i: int) -> str:
    # DuckDB md5 takes VARCHAR; payload bytes ARE the utf8 text, so
    # md5(text) hashes identical bytes to the Spark codec. Feature i is
    # digest byte i (hex chars 2i+1..2i+2) / 255 — the codec's single-
    # digest numpy slice, mirrored.
    return (
        f"CAST(CAST(concat('0x', substr(md5(text), {2 * i + 1}, 2)) "
        "AS INT) AS DOUBLE) / CAST(255.0 AS DOUBLE)"
    )


MM3_ORACLE = f"""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       {_feature_sql(0)} AS f0,
       {_feature_sql(7)} AS f7
FROM documents
"""


@register(
    "mm3_decode_features",
    MM3_ORACLE,
    doc="Arrow-batched mapInPandas decode with the deterministic fake "
    "codec (md5-derived features) — the real-codec plumbing, "
    "oracle-checked end to end",
)
def mm3_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = multimodal.decode_media(
        _media(spark, sf_dir), codec=multimodal.deterministic_fake_codec
    )
    return decoded.select(
        "media_id",
        "n_bytes",
        F.col("features")[0].alias("f0"),
        F.col("features")[7].alias("f7"),
    )


MM4_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         n_chars % 640 + 1 AS w, n_chars % 480 + 1 AS h
  FROM documents
)
SELECT media_id,
       CAST(floor(w * least(1.0, 512.0 / greatest(w, h))) AS INT) AS target_width,
       CAST(floor(h * least(1.0, 512.0 / greatest(w, h))) AS INT) AS target_height
FROM m
"""


@register(
    "mm4_resize_plan",
    MM4_ORACLE,
    doc="aspect-preserving resize metadata transform (target dims capped "
    "at 512px) — native struct math; pixel resample is the pluggable "
    "codec kernel",
)
def mm4_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = multimodal.resize_plan(_media(spark, sf_dir), max_px=512)
    return out.select("media_id", "target_width", "target_height")


# --- mm5: perceptual-hash near-dup (banded Hamming join) ------------------

MM5_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
), m AS (
  SELECT doc_id AS mid,
         ('0x' || substr(md5(text), 1, 15))::BIGINT AS phash
  FROM corpus
), bands AS (
  SELECT mid, phash, b.band_idx,
         (phash // (1::BIGINT << (b.band_idx * 15))) % 32768 AS band_val
  FROM m, (SELECT unnest(generate_series(0, 3)) AS band_idx) b
), cands AS (
  SELECT DISTINCT a.mid AS id_a, c.mid AS id_b, a.phash AS ha, c.phash AS hb
  FROM bands a JOIN bands c
    ON a.band_idx = c.band_idx AND a.band_val = c.band_val
   AND a.mid < c.mid
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cands
WHERE bit_count(xor(ha, hb)) <= 6
ORDER BY id_a, id_b
"""


@register(
    "mm5_media_near_dup",
    MM5_ORACLE,
    doc="perceptual-hash near-dup for media: 60-bit phash (digest-"
    "derived stand-in, real pHash drops in behind the same column), "
    "4x15-bit band join -> exact bit_count(xor) Hamming verify; the "
    "shuffle carries band keys and ids, never payloads. The corpus is "
    "salted with 50 re-uploaded payloads under new ids, so the oracle "
    "proves the banding recovers exactly those duplicate pairs",
)
def mm5_media_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir)
    dupes = media.filter(F.col("media_id") < 50).withColumn(
        "media_id", F.col("media_id") + 100000
    )
    return multimodal.media_near_dup(media.unionByName(dupes), max_hamming=6)


# --- mm6: contrastive text-media pair construction ---------------------------

_MM6_POOL = 3  # negative-candidate pool per language
_MM6_N = 2  # negatives per anchor

MM6_ORACLE = f"""
WITH pool AS (
  SELECT lang, doc_id AS neg_id, md5(text) AS neg_fp,
         row_number() OVER (
             PARTITION BY lang
             ORDER BY md5('neg:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS pool_rank
  FROM documents
), pool_cut AS (
  SELECT * FROM pool WHERE pool_rank <= {_MM6_POOL}
), paired AS (
  SELECT d.doc_id AS anchor_id, md5(d.text) AS anchor_fp,
         p.neg_id AS neg_media_id, p.neg_fp,
         row_number() OVER (
             PARTITION BY d.doc_id ORDER BY p.pool_rank) AS neg_rank
  FROM documents d
  JOIN pool_cut p ON p.lang = d.lang AND p.neg_id <> d.doc_id
)
SELECT anchor_id, anchor_fp, neg_media_id, neg_fp,
       CAST(neg_rank AS BIGINT) AS neg_rank
FROM paired WHERE neg_rank <= {_MM6_N}
"""


@register(
    "mm6_contrastive_pairs",
    MM6_ORACLE,
    doc="contrastive text-media training-pair construction (CLIP-prep "
    "shape): each document anchors its own media payload as the "
    "positive (same id — fingerprints prove the linkage) and draws "
    f"{_MM6_N} deterministic same-language negatives from a "
    f"{_MM6_POOL}-member salted-md5 pool per language (shared "
    "in-batch-negative style — the pool BROADCASTS, so negative "
    "mining never shuffles the corpus); payloads ride as md5 "
    "fingerprints, never bytes. Pool construction is skew-proof: a "
    "two-stage top-k (rank within (lang, salt), keep pool-size per "
    "salt, re-rank the bounded union) so no task ever sorts a whole "
    "language — the global per-lang top-k is always a subset of the "
    "union of per-salt top-ks, so results are identical",
)
def mm6_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    media_fp = multimodal.media_fingerprint(_media(spark, sf_dir)).select(
        F.col("media_id"), F.col("fingerprint")
    )
    # Stage 1: per-(lang, salt) top-POOL — bounds every sort task to
    # ~|lang|/S rows even when one language is 80% of the corpus.
    n_salts = 16
    cand = docs.select("lang", F.col("doc_id").alias("neg_id")).withColumn(
        "h", F.md5(F.concat(F.lit("neg:"), F.col("neg_id").cast("string")))
    )
    w_pre = Window.partitionBy("lang", "salt").orderBy("h", "neg_id")
    pre = (
        cand.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("neg_id")), F.lit(n_salts))
        )
        .withColumn("pre_rank", F.row_number().over(w_pre))
        .filter(F.col("pre_rank") <= _MM6_POOL)
        .drop("salt", "pre_rank")
    )
    # Stage 2: re-rank the <= n_salts*POOL survivors per lang (tiny).
    w = Window.partitionBy("lang").orderBy("h", "neg_id")
    pool = (
        pre.withColumn("pool_rank", F.row_number().over(w))
        .filter(F.col("pool_rank") <= _MM6_POOL)
        .drop("h")
        .join(
            media_fp.select(
                F.col("media_id").alias("neg_id"),
                F.col("fingerprint").alias("neg_fp"),
            ),
            "neg_id",
        )
    )
    anchors = docs.select(
        F.col("doc_id").alias("anchor_id"), "lang"
    ).join(
        media_fp.select(
            F.col("media_id").alias("anchor_id"),
            F.col("fingerprint").alias("anchor_fp"),
        ),
        "anchor_id",
    )
    w2 = Window.partitionBy("anchor_id").orderBy("pool_rank")
    return (
        anchors.join(F.broadcast(pool), "lang")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .withColumn("neg_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("neg_rank") <= _MM6_N)
        .select(
            "anchor_id",
            "anchor_fp",
            F.col("neg_id").alias("neg_media_id"),
            "neg_fp",
            "neg_rank",
        )
    )


# --- mm7: per-video frame dedup -----------------------------------------------

_MM7_CYCLE = 5  # synthetic duplicate-frame period (static-scene stand-in)

MM7_ORACLE = f"""
WITH frames AS (
  SELECT doc_id AS media_id, md5(text) AS media_fp, gs.f AS frame_idx
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0,
           CAST(floor((n_chars * 40 - 1) / 1000.0) AS BIGINT))) AS f) gs
  WHERE n_chars > 0 AND doc_id % 3 = 2
), fp AS (
  SELECT media_id, frame_idx,
         md5(media_fp || ':' || CAST(frame_idx % {_MM7_CYCLE} AS VARCHAR))
             AS frame_fp
  FROM frames
), kept AS (
  SELECT media_id, frame_fp, min(frame_idx) AS k
  FROM fp GROUP BY 1, 2
), per_video AS (
  SELECT media_id,
         CAST(count(*) AS BIGINT) AS n_unique,
         md5(string_agg(CAST(k AS VARCHAR), ',' ORDER BY k)) AS kept_digest
  FROM kept GROUP BY 1
), totals AS (
  SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames
  FROM frames GROUP BY 1
)
SELECT t.media_id, t.n_frames, p.n_unique,
       CAST(t.n_frames - p.n_unique AS BIGINT) AS n_dropped,
       p.kept_digest
FROM totals t JOIN per_video p USING (media_id)
"""


@register(
    "mm7_frame_dedup",
    MM7_ORACLE,
    doc="per-video frame dedup (static-scene removal before frame "
    "decode): mm2's sampling plan + per-frame fingerprints, keep the "
    "earliest frame per (video, fingerprint), report per-video "
    "sampled/unique/dropped counts and an order-pinned digest of the "
    "kept frame indexes. Dedup is WITHIN the video key — the "
    "(media_id, frame_fp) shuffle never grows past one video's frame "
    "count per reducer group, and payloads never ride (fingerprints "
    f"only). Duplicate frames synthesized with period {_MM7_CYCLE}; a "
    "real deployment swaps the synthetic frame_fp for a phash of the "
    "decoded frame (mm1/mm5's fingerprint path)",
)
def mm7_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir).filter(F.col("kind") == "video")
    frames = multimodal.frame_sample_plan(media)
    media_fp = multimodal.media_fingerprint(media).select(
        "media_id", F.col("fingerprint").alias("media_fp")
    )
    f = frames.join(media_fp, "media_id").withColumn(
        "frame_fp",
        F.md5(
            F.concat(
                F.col("media_fp"),
                F.lit(":"),
                (F.col("frame_idx") % _MM7_CYCLE).cast("string"),
            )
        ),
    )
    kept = f.groupBy("media_id", "frame_fp").agg(
        F.min("frame_idx").alias("k")
    )
    per_video = kept.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("k")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("kept_digest"),
    )
    totals = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames")
    )
    return totals.join(per_video, "media_id").select(
        "media_id",
        "n_frames",
        "n_unique",
        (F.col("n_frames") - F.col("n_unique")).cast("long").alias("n_dropped"),
        "kept_digest",
    )


# --- mm8: scene segmentation from frame fingerprints ----------------------------

MM8_ORACLE = """
WITH frames AS (
  SELECT doc_id AS media_id, md5(text) AS media_fp, gs.f AS frame_idx,
         doc_id % 4 + 2 AS period
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0,
           CAST(floor((n_chars * 40 - 1) / 1000.0) AS BIGINT))) AS f) gs
  WHERE n_chars > 0 AND doc_id % 3 = 2
), fp AS (
  SELECT media_id, frame_idx,
         md5(media_fp || ':' || CAST(frame_idx // period AS VARCHAR))
             AS frame_fp
  FROM frames
), cut AS (
  SELECT media_id, frame_idx, frame_fp,
         CASE WHEN lag(frame_fp) OVER w IS NULL
                   OR lag(frame_fp) OVER w <> frame_fp
              THEN 1 ELSE 0 END AS is_cut
  FROM fp
  WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx)
), seg AS (
  SELECT media_id, frame_idx, frame_fp,
         CAST(sum(is_cut) OVER (PARTITION BY media_id ORDER BY frame_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS scene_id
  FROM cut
)
SELECT media_id, scene_id,
       CAST(min(frame_idx) AS BIGINT) AS start_frame,
       CAST(max(frame_idx) AS BIGINT) AS end_frame,
       CAST(count(*) AS BIGINT) AS n_frames,
       min(frame_fp) AS frame_fp
FROM seg GROUP BY 1, 2
"""


@register(
    "mm8_scene_segments",
    MM8_ORACLE,
    doc="scene segmentation over per-frame fingerprint streams (the "
    "shot-cut detector shape): a boundary is any frame whose "
    "fingerprint differs from its predecessor; scene id = running cut "
    "count; one row per scene with frame span. lag + prefix sum + "
    "groupBy, all partitioned by the video key — per-task state is "
    "one video's frames, payloads never shuffle (fingerprints only). "
    "Synthetic fps here carry a per-video scene period (media_id%4+2) "
    "so runs and cuts both occur; a real deployment feeds phash of "
    "the decoded frame (mm1/mm5 path)",
)
def mm8_scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir).filter(F.col("kind") == "video")
    frames = multimodal.frame_sample_plan(media)
    media_fp = multimodal.media_fingerprint(media).select(
        "media_id", F.col("fingerprint").alias("media_fp")
    )
    f = frames.join(media_fp, "media_id").select(
        "media_id",
        "frame_idx",
        F.md5(
            F.concat(
                F.col("media_fp"),
                F.lit(":"),
                F.expr("frame_idx div (media_id % 4 + 2)").cast("string"),
            )
        ).alias("frame_fp"),
    )
    return multimodal.scene_segments(f)


# --- mm9: frame-to-caption alignment --------------------------------------------

_MM9_CAP_S = 5  # caption length in seconds; caption j = [j*5 - 1, (j+1)*5)

MM9_ORACLE = f"""
WITH frames AS (
  SELECT doc_id AS media_id, gs.f AS frame_idx
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0,
           CAST(floor((n_chars * 40 - 1) / 1000.0) AS BIGINT))) AS f) gs
  WHERE n_chars > 0 AND doc_id % 3 = 2
), nf AS (
  SELECT media_id, max(frame_idx) + 1 AS n FROM frames GROUP BY media_id
), caps AS (
  SELECT media_id, gs.j AS cap_id,
         CAST(gs.j * {_MM9_CAP_S} - 1 AS BIGINT) AS cs,
         CAST((gs.j + 1) * {_MM9_CAP_S} AS BIGINT) AS ce
  FROM nf,
       LATERAL (SELECT unnest(generate_series(0,
           CAST((n + {_MM9_CAP_S} - 1) // {_MM9_CAP_S} AS BIGINT) - 1)) AS j)
           gs
), m AS (
  SELECT f.media_id, f.frame_idx, c.cap_id
  FROM frames f JOIN caps c
    ON f.media_id = c.media_id
   AND c.cs <= f.frame_idx AND f.frame_idx < c.ce
)
SELECT media_id, frame_idx,
       CAST(count(*) AS BIGINT) AS n_captions,
       CAST(min(cap_id) AS BIGINT) AS first_caption,
       CAST(max(cap_id) AS BIGINT) AS last_caption
FROM m GROUP BY 1, 2
"""


@register(
    "mm9_caption_align",
    MM9_ORACLE,
    doc="frame-to-caption alignment: every sampled video frame (mm2's "
    "plan, 1 fps) is matched to the subtitle/caption interval(s) "
    "covering its timestamp — the pairing step of any video-text "
    "contrastive or captioning corpus build. Captions deliberately "
    "OVERLAP one second (subtitle cross-fade), so boundary frames "
    "match two — the half-open interval join must get both. Runs on "
    "rangejoin.interval_join_binned with the media key INSIDE the "
    "equi-join and the SAME column name on both sides (the ADVICE-r10 "
    "dedup path: one unambiguous media_id out). Oracle is the direct "
    "inequality join on integer frame seconds. Scale: captions per "
    "video ~ duration/5s ride a (media, time-bin) equi-join; no "
    "cross-video pairs exist anywhere in the plan",
)
def mm9_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir).filter(F.col("kind") == "video")
    frames = multimodal.frame_sample_plan(media).select(
        "media_id",
        "frame_idx",
        F.timestamp_seconds(F.col("frame_idx")).alias("fts"),
    )
    L = _MM9_CAP_S
    caps = (
        frames.groupBy("media_id")
        .agg((F.max("frame_idx") + 1).alias("n"))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.expr(f"(n + {L} - 1) div {L}").cast("long") - 1,
                )
            ).alias("cap_id"),
        )
        .select(
            "media_id",
            "cap_id",
            F.timestamp_seconds(F.col("cap_id") * L - 1).alias("cs"),
            F.timestamp_seconds((F.col("cap_id") + 1) * L).alias("ce"),
        )
    )
    aligned = rangejoin.interval_join_binned(
        frames,
        caps,
        point_ts="fts",
        start_col="cs",
        end_col="ce",
        bin_seconds=L,
        equi_keys=[("media_id", "media_id")],
    )
    return aligned.groupBy("media_id", "frame_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_captions"),
        F.min("cap_id").cast("long").alias("first_caption"),
        F.max("cap_id").cast("long").alias("last_caption"),
    )
