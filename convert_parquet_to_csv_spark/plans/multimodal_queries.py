"""Driver-checked queries: multimodal binary-column pipeline.

``multimodal_stats`` has a full DuckDB oracle (binary payloads are
deterministic UTF-8 encodings, so octet arithmetic is replayable in
SQL). Feature extraction goes through mapInPandas with a stubbed
decoder; since r6 it is gated per row on the SQL-expressible contract
(row identity, kind mapping, feature width, component range) — the
blake2b feature values themselves stay pytest-pinned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators import multimodal as M
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.plans.scratch import scratch_dir
from convert_parquet_to_csv_spark.sources import read_parquet


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    return M.media_table_from_documents(docs)


_STATS_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
         octet_length(encode(coalesce(text, ''))) AS n_bytes
  FROM documents
)
SELECT kind,
       COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MAX(n_bytes) AS max_bytes
FROM media GROUP BY kind ORDER BY kind
"""


@query("multimodal_stats", oracle=_STATS_ORACLE)
def multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind media byte stats over the typed binary table."""
    return M.media_stats(_media(spark, sf_dir))


# Per-row property oracle (VERDICT r5 item 5): DuckDB can't run the
# blake2b stub decoder, but every row's CONTRACT is SQL-expressible —
# one output row per media item (id + kind mapping replayed from
# documents), fixed feature width, and the stub's [-1, 1) component
# range verified per row. A red row means the mapInPandas seam
# dropped/duplicated rows, mis-shaped a batch, or emitted garbage —
# everything the old rows-only check couldn't see.
_FEATURES_ORACLE = f"""
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
       CAST({M.FEATURE_DIM} AS INT) AS feature_dim,
       TRUE AS in_range
FROM documents
"""


@query("multimodal_features", oracle=_FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (stub decoder, real plumbing),
    gated per row: feature width and the deterministic stub's [-1, 1)
    range are checked for every media item (see ``_FEATURES_ORACLE``).
    The feature VALUES are additionally pinned exactly by
    tests/test_multimodal.py against the reference stub."""
    feats = M.extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "kind",
        F.size("feature").alias("feature_dim"),
        F.forall(
            "feature", lambda x: (x >= -1.0) & (x < 1.0)
        ).alias("in_range"),
    ).orderBy("media_id")


_FRAMES_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id,
         hex(encode(coalesce(text, ''))) AS h,
         octet_length(encode(coalesce(text, ''))) AS total
  FROM documents WHERE doc_id % 3 = 2
), p AS (
  SELECT media_id, h, total,
         greatest(CAST(floor(total / 4.0) AS INT), 1) AS per
  FROM media
), idx AS (
  SELECT media_id, h, total, per,
         unnest(range(0, 4)) AS frame_idx
  FROM p
)
SELECT media_id,
       CAST(frame_idx AS INT) AS frame_idx,
       substring(h, CAST(frame_idx * per * 2 + 1 AS BIGINT),
                 CAST(per * 2 AS BIGINT)) AS frame_hex,
       CAST(length(substring(h, CAST(frame_idx * per * 2 + 1 AS BIGINT),
                             CAST(per * 2 AS BIGINT))) / 2 AS BIGINT)
         AS frame_bytes
FROM idx WHERE frame_idx * per < total
"""


@query("multimodal_frame_sample", oracle=_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even-stride frame sampling over video payloads
    (operators/multimodal.sample_frames): explode to one row per
    (media, frame), slice byte ranges positionally — the exact table
    shape a real keyframe extractor feeds downstream. The frame bytes
    themselves are value-checked: DuckDB can't slice BLOBs, so both
    engines compare the frames' hex rendering (uppercase in both)."""
    frames = M.sample_frames(_media(spark, sf_dir), n_frames=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.hex("frame").alias("frame_hex"),
        "frame_bytes",
    )


# --- resize (geometry gated, kernel pytest-pinned) ------------------------

# The oracle replays the GEOMETRY contract from the same synthesized
# metadata (kind/width/height derive from doc_id and text length —
# see operators/multimodal.media_table_from_documents): new dims are
# floor(dim/2) clamped to 1, out_bytes = new_w*new_h. The resized
# PIXELS can't be SQL-replayed (block-mean over a byte grid);
# tests/test_multimodal.py pins the kernel on hand-built grids
# instead — same split as the frame-sample query.
_RESIZE_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id,
         octet_length(encode(coalesce(text, ''))) AS n_bytes,
         doc_id % 3 AS k
  FROM documents),
img AS (
  SELECT media_id,
         CAST(n_bytes % 640 + 1 AS INT) AS width,
         CAST(n_bytes % 480 + 1 AS INT) AS height
  FROM media WHERE k = 0)
SELECT media_id, width, height,
       CAST(greatest(width // 2, 1) AS INT) AS new_width,
       CAST(greatest(height // 2, 1) AS INT) AS new_height,
       CAST(greatest(width // 2, 1) * greatest(height // 2, 1)
            AS BIGINT) AS out_bytes
FROM img
"""


@query("multimodal_resize_geometry", oracle=_RESIZE_ORACLE)
def multimodal_resize_geometry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """2× image downsample through the real mapInPandas resize stage
    (operators/multimodal.resize_images — exact integer block means,
    geometry flattened into the Arrow batch). The gate hashes the
    geometry contract; the pixel kernel is pinned by unit test (see
    the oracle comment for the split)."""
    resized = M.resize_images(_media(spark, sf_dir), factor=2)
    return resized.select(
        "media_id", "width", "height", "new_width", "new_height",
        "out_bytes",
    )


# --- pure-JVM audio frame energy ------------------------------------------

_ENERGY_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id,
         hex(encode(coalesce(text, ''))) AS h,
         octet_length(encode(coalesce(text, ''))) AS total
  FROM documents WHERE doc_id % 3 = 1
), bytes AS (
  SELECT media_id,
         CAST(u.i AS BIGINT) AS idx,
         CAST('0x' || substring(h, CAST(u.i * 2 + 1 AS INT), 2)
              AS BIGINT) AS b
  FROM media, LATERAL unnest(range(0, total)) AS u(i)
  WHERE total > 0
), frames AS (
  SELECT media_id, idx // 256 AS frame, SUM(b) AS energy
  FROM bytes GROUP BY media_id, idx // 256
)
SELECT media_id,
       CAST(COUNT(*) AS INT) AS n_frames,
       CAST(SUM(energy) AS BIGINT) AS total_energy,
       CAST(MAX(energy) AS BIGINT) AS max_frame_energy
FROM frames GROUP BY media_id
"""


@query("multimodal_audio_energy", oracle=_ENERGY_ORACLE)
def multimodal_audio_energy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-frame byte energy over the audio-kind binary payloads —
    the silence-detection / loudness-profile stage, computed with
    ZERO Python: bytes surface as integers via hex + substring + conv
    (all codegen'd), frames are integer division of the byte index,
    and the two-level aggregate is ordinary map-side-combined
    groupBys. This is the fifth multimodal stage and the counterpoint
    to the mapInPandas decode path: when the "decode" is byte
    arithmetic, the JVM expression layer does it without crossing
    into Python at all. (Real PCM would decode samples, not raw
    bytes — the frame/aggregate shape is identical.)"""
    media = _media(spark, sf_dir).filter(F.col("kind") == "audio")
    h = media.select(
        "media_id",
        F.hex(F.col("content")).alias("h"),
        F.octet_length(F.col("content")).alias("total"),
    )
    # sequence(0, -1) yields a DESCENDING [0, -1] (not empty) when
    # total = 0 — filter empty payloads (mirrored in the oracle).
    bytes_ = h.filter(F.col("total") > 0).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("total") - 1)
        ).alias("idx"),
        "h",
    ).select(
        "media_id",
        F.col("idx").cast("bigint").alias("idx"),
        F.conv(
            F.substring(
                F.col("h"), F.col("idx") * 2 + 1, F.lit(2)
            ),
            16, 10,
        ).cast("bigint").alias("b"),
    )
    frames = bytes_.groupBy(
        "media_id", F.expr("idx div 256").alias("frame")
    ).agg(F.sum("b").alias("energy"))
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.sum("energy").cast("bigint").alias("total_energy"),
        F.max("energy").cast("bigint").alias("max_frame_energy"),
    )


# --- real pixel decode: PGM end-to-end (r10) -------------------------------

# The oracle replays the fixture CONSTRUCTION (pad text to w*h chars,
# pixel = ascii code) plus the whole decode chain's integer
# arithmetic — geometry, pixel sums, and the factor-2 block-mean
# resize — so a parser bug anywhere (comment skipping, P5's single
# post-maxval whitespace byte, P2 tokenizing, raster length) lands as
# a value mismatch, not just a row-count drift. ASCII assumption: the
# synthetic fixture vocabulary is single-byte; a multi-byte char
# would raise at fixture-write time (ord > 255) rather than silently
# diverge from the oracle's per-CHARACTER ascii() replay.
_PGM_ORACLE = """
WITH sub AS (
  SELECT doc_id, text, length(text) AS nc
  FROM documents WHERE doc_id % 41 = 0 AND text IS NOT NULL
), geom AS (
  SELECT doc_id, text, nc % 13 + 3 AS w, nc % 7 + 2 AS h FROM sub
), pix AS (
  SELECT doc_id, w, h, CAST(u.i AS BIGINT) AS i,
         ascii(substring(rpad(text, CAST(w * h AS INT), 'x'),
                         CAST(u.i + 1 AS INT), 1)) AS px
  FROM geom, LATERAL unnest(range(0, w * h)) AS u(i)
), st AS (
  SELECT doc_id, CAST(sum(px) AS BIGINT) AS pixel_sum
  FROM pix GROUP BY 1
), bs AS (
  SELECT doc_id, (i // w) // 2 AS br, (i % w) // 2 AS bc,
         CAST(sum(px) // 4 AS BIGINT) AS bm
  FROM pix
  WHERE (i // w) < (h // 2) * 2 AND (i % w) < (w // 2) * 2
  GROUP BY 1, 2, 3
), rs AS (
  SELECT doc_id, CAST(sum(bm) AS BIGINT) AS rs_pixel_sum
  FROM bs GROUP BY 1
)
SELECT g.doc_id AS media_id,
       CASE WHEN g.doc_id % 2 = 0 THEN 'P5' ELSE 'P2' END AS fmt,
       CAST(g.w AS INT) AS width,
       CAST(g.h AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST(g.w * g.h AS BIGINT) AS n_pixels,
       st.pixel_sum,
       CAST(st.pixel_sum // (g.w * g.h) AS BIGINT) AS mean_pixel,
       CAST(g.w // 2 AS INT) AS rs_width,
       CAST(g.h // 2 AS INT) AS rs_height,
       rs.rs_pixel_sum
FROM geom g JOIN st USING (doc_id) JOIN rs USING (doc_id)
"""


@query("multimodal_decode_pgm", oracle=_PGM_ORACLE)
def multimodal_decode_pgm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode end-to-end (r10, VERDICT r9 item 5 — the
    codec seam partially closed): the doc_id%41 document subset is
    materialized as actual .pgm FILES — P5 binary raster for even
    ids, P2 ASCII for odd, headers carrying a comment line to
    exercise the spec's '#' skipping; pixel bytes are the padded
    text's character codes, geometry derived from text length — then
    scanned back through Spark's binaryFile source and decoded by
    the pure-Python operators/multimodal.decode_pgm inside ONE
    mapInPandas stage that also computes exact integer pixel stats
    and the factor-2 block-mean resize (decode → stats → resize on
    real pixel data, no external codec, no stub).

    Same LOCAL-MODE fixture note as binaryfile_ingest: the fixture
    files land in the driver's local tmpdir (the collect exists only
    to write them — |corpus|/41 rows); a cluster points the same
    binaryFile scan at a shared filesystem."""
    import shutil

    docs = (
        read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        .filter((F.col("doc_id") % 41 == 0) & F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    sub = docs.collect()  # tiny: |corpus|/41 fixture rows
    dst = scratch_dir(sf_dir, "pgm_fixture")
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for row in sub:
        nc = len(row.text)
        w, h = nc % 13 + 3, nc % 7 + 2
        padded = (row.text + "x" * (w * h))[: w * h]
        codes = [ord(c) for c in padded]
        if max(codes) > 255:
            raise ValueError(
                "fixture text is not single-byte; the per-character "
                "oracle replay would diverge"
            )
        header = f"# r10 fixture\n{w} {h}\n255\n"
        if row.doc_id % 2 == 0:
            payload = b"P5\n" + header.encode("ascii") + bytes(codes)
        else:
            payload = (
                "P2\n" + header + " ".join(map(str, codes))
            ).encode("ascii")
        with open(os.path.join(dst, f"{row.doc_id}.pgm"), "wb") as fh:
            fh.write(payload)
    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pgm")
        .load(dst)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.pgm$", 1)
            .cast("bigint")
            .alias("media_id"),
            "content",
        )
    )
    return M.decode_pgm_table(media, factor=2)


# --- real pixel decode: PPM color end-to-end (r11) --------------------------

# Same replay doctrine as _PGM_ORACLE, now 3-channel: the fixture
# pads text to w*h*3 chars and interleaves them RGB (sample i →
# pixel i//3, channel i%3), so per-channel sums and the per-channel
# factor-2 block-mean resize are all integer arithmetic DuckDB can
# replay from the document text alone. A parser bug anywhere — P6's
# single post-maxval whitespace byte, P3 tokenizing, channel
# deinterleave, crop bounds — lands as a value mismatch.
_PPM_ORACLE = """
WITH sub AS (
  SELECT doc_id, text, length(text) AS nc
  FROM documents WHERE doc_id % 43 = 0 AND text IS NOT NULL
), geom AS (
  SELECT doc_id, text, nc % 11 + 2 AS w, nc % 5 + 2 AS h FROM sub
), pix AS (
  SELECT doc_id, w, h,
         CAST(u.i AS BIGINT) // 3 AS q,
         CAST(u.i AS BIGINT) % 3 AS c,
         ascii(substring(rpad(text, CAST(w * h * 3 AS INT), 'x'),
                         CAST(u.i + 1 AS INT), 1)) AS px
  FROM geom, LATERAL unnest(range(0, w * h * 3)) AS u(i)
), st AS (
  SELECT doc_id,
         CAST(sum(px) FILTER (WHERE c = 0) AS BIGINT) AS r_sum,
         CAST(sum(px) FILTER (WHERE c = 1) AS BIGINT) AS g_sum,
         CAST(sum(px) FILTER (WHERE c = 2) AS BIGINT) AS b_sum
  FROM pix GROUP BY 1
), bs AS (
  SELECT doc_id, c, (q // w) // 2 AS br, (q % w) // 2 AS bc,
         CAST(sum(px) // 4 AS BIGINT) AS bm
  FROM pix
  WHERE (q // w) < (h // 2) * 2 AND (q % w) < (w // 2) * 2
  GROUP BY 1, 2, 3, 4
), rs AS (
  SELECT doc_id,
         CAST(sum(bm) FILTER (WHERE c = 0) AS BIGINT) AS rs_r_sum,
         CAST(sum(bm) FILTER (WHERE c = 1) AS BIGINT) AS rs_g_sum,
         CAST(sum(bm) FILTER (WHERE c = 2) AS BIGINT) AS rs_b_sum
  FROM bs GROUP BY 1
)
SELECT g.doc_id AS media_id,
       CASE WHEN g.doc_id % 2 = 0 THEN 'P6' ELSE 'P3' END AS fmt,
       CAST(g.w AS INT) AS width,
       CAST(g.h AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST(g.w * g.h AS BIGINT) AS n_pixels,
       st.r_sum, st.g_sum, st.b_sum,
       CAST(g.w // 2 AS INT) AS rs_width,
       CAST(g.h // 2 AS INT) AS rs_height,
       rs.rs_r_sum, rs.rs_g_sum, rs.rs_b_sum
FROM geom g JOIN st USING (doc_id) JOIN rs USING (doc_id)
"""


@query("multimodal_decode_ppm", oracle=_PPM_ORACLE)
def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL color decode end-to-end (r11, VERDICT r10 item 4 — the
    codec seam narrowed to compressed formats): the doc_id%43
    document subset is materialized as actual .ppm FILES — P6 binary
    raster for even ids, P3 ASCII for odd, headers carrying a
    comment line — with the padded text's character codes
    RGB-interleaved as samples, then scanned back through Spark's
    binaryFile source and decoded by the pure-Python
    operators/multimodal.decode_ppm inside ONE mapInPandas stage
    that also computes exact per-channel integer stats and the
    factor-2 per-channel block-mean resize.

    Same LOCAL-MODE fixture note as multimodal_decode_pgm: the
    fixture files land in the driver's local tmpdir (the collect
    exists only to write them — |corpus|/43 rows); a cluster points
    the same binaryFile scan at a shared filesystem."""
    import shutil

    docs = (
        read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        .filter((F.col("doc_id") % 43 == 0) & F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    sub = docs.collect()  # tiny: |corpus|/43 fixture rows
    dst = scratch_dir(sf_dir, "ppm_fixture")
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for row in sub:
        nc = len(row.text)
        w, h = nc % 11 + 2, nc % 5 + 2
        n = w * h * 3
        padded = (row.text + "x" * n)[:n]
        codes = [ord(c) for c in padded]
        if max(codes) > 255:
            raise ValueError(
                "fixture text is not single-byte; the per-character "
                "oracle replay would diverge"
            )
        header = f"# r11 fixture\n{w} {h}\n255\n"
        if row.doc_id % 2 == 0:
            payload = b"P6\n" + header.encode("ascii") + bytes(codes)
        else:
            payload = (
                "P3\n" + header + " ".join(map(str, codes))
            ).encode("ascii")
        with open(os.path.join(dst, f"{row.doc_id}.ppm"), "wb") as fh:
            fh.write(payload)
    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(dst)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.ppm$", 1)
            .cast("bigint")
            .alias("media_id"),
            "content",
        )
    )
    return M.decode_ppm_table(media, factor=2)


# --- cross-modal consistency: CLIP-score shape (r11) ------------------------

_XMODAL_DIM = 16
_XMODAL_TAU = 0.1

# The oracle replays BOTH modalities value-exactly: the media vector
# is integer byte-block sums (block b = indices with i*dim div total
# == b — replayed per byte via unnest + integer division, where the
# Spark side computes the same partition as per-block sequence
# bounds [ceil(b·total/dim), ceil((b+1)·total/dim)-1] without any
# row explosion), the caption vector is the embedding's leading dim
# components cast to double, and cosine is list_dot_product — the
# same left-to-right float64 accumulation Spark's zip_with/aggregate
# does, bitwise-equal per the similarity-module contract. The keep
# verdict therefore compares identical doubles on both engines.
_XMODAL_ORACLE = f"""
WITH media AS (
  SELECT doc_id AS media_id, hex(encode(coalesce(text,''))) AS h,
         octet_length(encode(coalesce(text,''))) AS total
  FROM documents WHERE doc_id % 3 = 0
), mb AS (
  SELECT * FROM media WHERE total >= {_XMODAL_DIM}
), bytes AS (
  SELECT media_id, total, CAST(u.i AS BIGINT) AS i,
         CAST('0x' || substring(h, CAST(u.i*2+1 AS INT), 2) AS BIGINT)
           AS b
  FROM mb, LATERAL unnest(range(0, total)) AS u(i)
), blocks AS (
  SELECT media_id, total, (i * {_XMODAL_DIM}) // total AS blk,
         CAST(sum(b) AS DOUBLE) AS s
  FROM bytes GROUP BY 1, 2, 3
), mvec AS (
  SELECT media_id, total, list(s ORDER BY blk) AS mv
  FROM blocks GROUP BY 1, 2
), tv AS (
  SELECT vec_id AS media_id,
         list_transform(embedding[1:{_XMODAL_DIM}],
                        x -> CAST(x AS DOUBLE)) AS tvec
  FROM embeddings
), sc AS (
  SELECT mv.media_id, CAST(mv.total AS BIGINT) AS n_bytes,
         list_dot_product(mv.mv, tv.tvec) /
         (sqrt(list_dot_product(mv.mv, mv.mv)) *
          sqrt(list_dot_product(tv.tvec, tv.tvec))) AS cosine
  FROM mvec mv JOIN tv USING (media_id)
)
SELECT media_id, n_bytes, cosine, cosine >= {_XMODAL_TAU} AS keep
FROM sc
"""


@query("cross_modal_consistency", oracle=_XMODAL_ORACLE)
def cross_modal_consistency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal consistency filter (operators/multimodal.
    clip_score_pairs, r11 — VERDICT r10 item 3): per (image,
    caption) pair — image-kind media items joined to the embeddings
    table on media_id == vec_id — the CLIP-score-shaped cosine
    between a 16-block byte-sum media feature vector (JVM-side
    nested higher-order functions, no UDF, no per-byte explosion)
    and the caption embedding's leading 16 components, plus the
    ``keep = cosine >= 0.1`` curation verdict. Pairs with payloads
    under 16 bytes or no embedding row drop (documented contract).
    The pairing is a co-partitioned equi-join on the id — the
    standard per-pair shape that survives 100 TB (no cross join, no
    vector shuffle beyond the id-keyed join)."""
    media = _media(spark, sf_dir)
    vectors = read_parquet(
        spark, os.path.join(sf_dir, "embeddings.parquet")
    )
    return M.clip_score_pairs(
        media, vectors, dim=_XMODAL_DIM, tau=_XMODAL_TAU
    )


# --- real audio decode: WAV PCM end-to-end (r12) ----------------------------

# Same replay doctrine as _PGM_ORACLE/_PPM_ORACLE, now for audio: the
# fixture encodes each doc's even-padded utf-8 text as the raw
# little-endian 16-bit PCM sample stream of a real mono .wav file, so
# byte pairing, sign extension, the frame split, and the per-frame
# magnitude sums are all integer arithmetic DuckDB can replay from
# the documents table alone. A parser bug anywhere — RIFF chunk walk,
# fmt field offsets, little-endian pairing, two's-complement
# sign-extension, short last frame — lands as a value mismatch.
# Empty-text docs are filtered on BOTH sides (an empty doc would
# yield a 0-sample WAV whose Spark row has no oracle twin — the frame
# groupBy loses it; the %47 subset has none at any shipped SF, the
# filter pins the contract anyway — flagged by the r11 prevalidation).
_WAV_ORACLE = """
WITH sub AS (
  SELECT doc_id, encode(text) AS raw
  FROM documents
  WHERE doc_id % 47 = 0 AND text IS NOT NULL
    AND octet_length(encode(text)) > 0
), padded AS (
  SELECT doc_id,
         hex(raw) ||
         CASE WHEN octet_length(raw) % 2 = 1 THEN '00' ELSE '' END
           AS h,
         (octet_length(raw) + octet_length(raw) % 2) // 2 AS n
  FROM sub
), smp AS (
  SELECT doc_id, n, CAST(u.i AS BIGINT) AS i,
         CAST('0x' || substring(h, CAST(u.i*4+3 AS INT), 2) AS BIGINT)
           * 256 +
         CAST('0x' || substring(h, CAST(u.i*4+1 AS INT), 2) AS BIGINT)
           AS u16
  FROM padded, LATERAL unnest(range(0, n)) AS u(i)
), mag AS (
  SELECT doc_id, n, i // 64 AS frame,
         abs(CASE WHEN u16 >= 32768 THEN u16 - 65536 ELSE u16 END)
           AS m
  FROM smp
), fr AS (
  SELECT doc_id, n, frame, CAST(sum(m) AS BIGINT) AS e
  FROM mag GROUP BY 1, 2, 3
)
SELECT doc_id AS media_id,
       CAST(1 AS INT) AS num_channels,
       CAST(8000 AS INT) AS sample_rate,
       CAST(16 AS INT) AS bits,
       CAST(n AS BIGINT) AS n_samples,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(e) AS BIGINT) AS total_energy,
       CAST(max(e) AS BIGINT) AS max_frame_energy
FROM fr GROUP BY doc_id, n
"""


@query("multimodal_wav_energy", oracle=_WAV_ORACLE)
def multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (r12 day-one, slated by the r11
    ledger; VERDICT r10 item 4's audio half): the doc_id%47 document
    subset is materialized as actual mono 16-bit PCM .wav FILES —
    RIFF/WAVE with the samples being the even-padded utf-8 text's
    little-endian byte pairs — then scanned back through Spark's
    binaryFile source and decoded by the pure-Python
    operators/multimodal.decode_wav inside ONE mapInPandas stage
    (wav_energy_table) that splits the sample stream into 64-sample
    frames and reports exact integer Σ|sample| energies (total and
    max over frames). Gives multimodal_audio_energy's raw-byte
    arithmetic a real-samples twin through a real RIFF parser.

    Same LOCAL-MODE fixture note as multimodal_decode_pgm/_ppm: the
    fixture files land in the driver's local tmpdir (the collect
    exists only to write them — |corpus|/47 rows); a cluster points
    the same binaryFile scan at a shared filesystem."""
    import shutil
    import struct

    docs = (
        read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        .filter(
            (F.col("doc_id") % 47 == 0)
            & F.col("text").isNotNull()
            & (F.length("text") > 0)
        )
        .select("doc_id", "text")
    )
    sub = docs.collect()  # tiny: |corpus|/47 fixture rows
    dst = scratch_dir(sf_dir, "wav_fixture")
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for row in sub:
        raw = row.text.encode("utf-8")
        if len(raw) % 2:
            raw += b"\x00"
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        chunks = (
            b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        payload = (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
            + chunks
        )
        with open(os.path.join(dst, f"{row.doc_id}.wav"), "wb") as fh:
            fh.write(payload)
    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(dst)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.wav$", 1)
            .cast("bigint")
            .alias("media_id"),
            "content",
        )
    )
    return M.wav_energy_table(media, frame_len=64)
