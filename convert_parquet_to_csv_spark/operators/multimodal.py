"""Multimodal column plumbing: image/audio/video as typed binary.

Design (BASELINE.json north-star): media travels as an opaque
``binary`` content column plus a typed metadata struct; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages. The Spark-side plumbing — schema, partition
sizing, UDF signatures, batch shapes — is real and tested; the codec
call itself is STUBBED (``decoder="stub"``) because no image/audio
library ships in this container: ``decoder="pil"``/``"ffmpeg"`` raise
``NotImplementedError`` at the exact seam a real codec plugs into —
EXCEPT Netpbm grayscale (PGM), which :func:`decode_pgm` parses in
pure Python (r10), so decode → stats → resize runs end-to-end on
real pixel bytes with no external library.

Scale notes: media rows are big (MBs); the knobs that matter are
``spark.sql.files.maxPartitionBytes`` (keep a partition's batch of
decoded frames in executor memory) and
``spark.sql.execution.arrow.maxRecordsPerBatch`` (bound the pandas
batch). Feature extraction emits small fixed-width vectors — the
right shape to write back columnar and feed the similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id LONG, kind STRING, content BINARY, "
    "meta STRUCT<width: INT, height: INT, sample_rate: INT, n_frames: INT>"
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = f"media_id LONG, kind STRING, feature ARRAY<FLOAT>"
_FRAMES_SCHEMA = (
    "media_id LONG, frame_idx INT, frame BINARY, frame_bytes LONG"
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's text bytes
    become the binary payload, round-robin kind, synthesized metadata.
    Exists so every downstream stage runs on real (binary, meta)
    columns without shipping actual media in the fixtures."""
    content = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    n_bytes = F.octet_length(content)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.struct(
            F.when(kind == "image", (n_bytes % 640 + 1).cast("int")).alias("width"),
            F.when(kind == "image", (n_bytes % 480 + 1).cast("int")).alias("height"),
            F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
            F.when(kind == "video", (n_bytes % 24 + 1).cast("int")).alias("n_frames"),
        ).alias("meta"),
    )


def _stub_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake embedding: blake2b-seeded floats in [-1, 1).

    STUB — stands in for the real decode→model forward pass; stable
    across runs/engines so tests can assert exact values.
    """
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.blake2b(payload, digest_size=8, salt=counter.to_bytes(8, "little")).digest()
        v = int.from_bytes(h, "little") / 2**63 - 1.0
        out.append(float(v))
        counter += 1
    return out


def extract_features(
    media: DataFrame,
    decoder: str = "stub",
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """Decode + feature-extract: (media_id, kind, feature ARRAY<FLOAT>).

    ``mapInPandas`` — one Arrow batch of (content, …) in, one batch of
    fixed-width vectors out; the iterator contract keeps memory at
    batch granularity regardless of partition size.
    """
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder {decoder!r}: NON-TRIVIAL codecs (PIL/ffmpeg/"
            "torchaudio for JPEG/PNG/audio/video) are not available "
            "in this environment — plug them in here. Netpbm "
            "grayscale (PGM) decodes natively via decode_pgm / "
            "decode_pgm_table (r10) — real pixel parsing, no "
            "external library; the 'stub' decoder exercises the "
            "identical Spark plumbing for the rest"
        )
    from convert_parquet_to_csv_spark.shipping import ensure_package_shipped

    # The closure references module-level _stub_feature → workers must
    # import this package; ship it (works from any driver cwd/cluster).
    ensure_package_shipped(media.sparkSession)

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                _stub_feature(bytes(c) if c is not None else b"", feature_dim)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: split the payload into n even
    byte-range "frames" (STUB for keyframe extraction — real ffmpeg
    seek goes at the marked seam). Pure built-in expressions: no UDF,
    the explode shape is what a real frame table looks like."""
    video = media.filter(F.col("kind") == "video")
    total = F.octet_length(F.col("content"))
    per = F.greatest((total / n_frames).cast("int"), F.lit(1))
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    with_idx = video.select("media_id", "content", total.alias("_total"), per.alias("_per"), idx)
    # substring on binary is positional (1-based); STUB seam: replace
    # byte-range slicing with codec keyframe extraction.
    frame = F.expr("substring(content, frame_idx * _per + 1, _per)")
    return (
        with_idx.filter(F.col("frame_idx") * F.col("_per") < F.col("_total"))
        .select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            frame.alias("frame"),
            F.octet_length(frame).cast("long").alias("frame_bytes"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind byte statistics — the metadata-only aggregation that
    must not touch content bytes beyond the pruned octet_length."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.octet_length("content")).alias("total_bytes"),
            F.max(F.octet_length("content")).alias("max_bytes"),
        )
        .orderBy("kind")
    )


_RESIZE_SCHEMA = (
    "media_id LONG, width INT, height INT, new_width INT, "
    "new_height INT, out_bytes LONG, resized BINARY"
)


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Resize for image rows: interpret the payload as a row-major
    width×height grayscale grid (zero-padded / truncated — the STUB
    stand-in for a real decode; a PIL/torchvision kernel plugs into
    the same batch loop), downsample by ``factor`` via exact integer
    block means (sum of each f×f block // f²), and re-emit the
    resized grid as binary plus its new geometry.

    Plumbing is the real thing a production resize stage needs:
    meta-struct geometry flattened INTO the Arrow batch (the kernel
    must not re-parse metadata per row), ``mapInPandas`` iterator
    memory bounded at batch granularity, numpy vectorized block
    reduction (no per-pixel Python), deterministic output bytes
    (integer arithmetic, no float rounding)."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    from convert_parquet_to_csv_spark.shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    images = media.filter(F.col("kind") == "image").select(
        "media_id",
        "content",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )

    def _resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [],
                "new_width": [], "new_height": [], "out_bytes": [],
                "resized": [],
            }
            for mid, content, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                w, h = int(w), int(h)
                buf = bytes(content) if content is not None else b""
                need = w * h
                buf = (buf + b"\x00" * need)[:need]
                grid = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
                nh, nw = max(h // factor, 1), max(w // factor, 1)
                ch, cw = nh * factor, nw * factor
                if ch > h or cw > w:  # degenerate tiny image
                    resized = grid[:nh, :nw]
                else:
                    blocks = (
                        grid[:ch, :cw]
                        .reshape(nh, factor, nw, factor)
                        .astype(np.uint32)
                    )
                    resized = (
                        blocks.sum(axis=(1, 3)) // (factor * factor)
                    ).astype(np.uint8)
                payload = resized.tobytes()
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["new_width"].append(resized.shape[1])
                out["new_height"].append(resized.shape[0])
                out["out_bytes"].append(len(payload))
                out["resized"].append(payload)
            yield pd.DataFrame(out)

    return images.mapInPandas(_resize, schema=_RESIZE_SCHEMA)


# --------------------------------------------------------------------------
# Real pixel decode: Netpbm grayscale (PGM), pure Python (r10)
# --------------------------------------------------------------------------

def decode_pgm(payload: bytes) -> tuple[str, int, int, int, bytes]:
    """Pure-Python Netpbm grayscale decoder — P2 (ASCII) and P5
    (binary raster), ``maxval <= 255`` (r10, VERDICT r9 item 5):
    the trivially-parseable image format that lets the multimodal
    chain decode REAL pixel data end-to-end with no external codec.
    Handles header whitespace and ``#`` comments per the spec; after
    P5's maxval exactly ONE whitespace byte precedes the raster.

    Returns ``(fmt, width, height, maxval, pixels)`` with pixels as
    ``width*height`` bytes, row-major. Raises ``ValueError`` on a
    malformed header or short raster — the error surfaces per-batch
    in the mapInPandas stage, carrying the media_id context from the
    caller's loop.
    """
    magic = bytes(payload[:2])
    if magic not in (b"P2", b"P5"):
        raise ValueError(f"not a PGM payload (magic {magic!r})")
    fmt = magic.decode("ascii")
    pos = 2
    vals: list[int] = []
    # header: three decimal tokens (width height maxval), arbitrary
    # whitespace between, '#' comments running to end-of-line
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError(f"malformed PGM header at byte {pos}")
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 0 < maxval <= 255:
        raise ValueError(f"unsupported PGM geometry {w}x{h}@{maxval}")
    if fmt == "P5":
        # exactly ONE whitespace byte after maxval, then raw raster
        if not payload[pos : pos + 1].isspace():
            raise ValueError("missing post-maxval whitespace byte")
        pos += 1
        pixels = bytes(payload[pos : pos + w * h])
    else:
        toks = bytes(payload[pos:]).split()
        if len(toks) > w * h:
            raise ValueError(
                f"excess raster: {len(toks)} tokens for {w * h} pixels"
            )
        pixels = bytes(int(t) for t in toks)
    if len(pixels) != w * h:
        raise ValueError(
            f"short raster: {len(pixels)} of {w * h} pixels"
        )
    if fmt == "P2" and max(pixels, default=0) > maxval:
        raise ValueError("pixel above maxval")
    return fmt, w, h, maxval, pixels


_DECODE_PGM_SCHEMA = (
    "media_id LONG, fmt STRING, width INT, height INT, maxval INT, "
    "n_pixels LONG, pixel_sum LONG, mean_pixel LONG, "
    "rs_width INT, rs_height INT, rs_pixel_sum LONG"
)


def decode_pgm_table(
    media: DataFrame, factor: int = 2
) -> DataFrame:
    """decode → stats → resize on REAL pixel data, one Arrow batch
    loop (r10): parse each (media_id, content) payload with
    :func:`decode_pgm`, report geometry + exact integer pixel stats,
    then downsample by ``factor`` with the same integer block-mean
    kernel :func:`resize_images` uses (sum of each f×f block
    // f², cropped to full blocks) and report the resized sum —
    every output column is exact integer arithmetic, so an oracle
    that replays the payload construction can replay the whole
    decode chain in SQL.

    Plan shape: ONE mapInPandas over the media rows; batch-granular
    memory; numpy-vectorized block reduction. At 100 TB the stage
    scales like any binary-column map — partition sizing via
    ``spark.sql.files.maxPartitionBytes`` (the module-docstring
    knobs), no shuffle.
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    from convert_parquet_to_csv_spark.shipping import (
        ensure_package_shipped,
    )

    ensure_package_shipped(media.sparkSession)

    def _decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "fmt", "width", "height", "maxval",
                "n_pixels", "pixel_sum", "mean_pixel",
                "rs_width", "rs_height", "rs_pixel_sum",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                fmt, w, h, mv, px = decode_pgm(
                    bytes(content) if content is not None else b""
                )
                grid = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                psum = int(grid.sum(dtype=np.int64))
                nh, nw = max(h // factor, 1), max(w // factor, 1)
                ch, cw = nh * factor, nw * factor
                if ch > h or cw > w:  # degenerate tiny image
                    rs = grid[:nh, :nw].astype(np.int64)
                else:
                    rs = (
                        grid[:ch, :cw]
                        .reshape(nh, factor, nw, factor)
                        .astype(np.int64)
                        .sum(axis=(1, 3))
                        // (factor * factor)
                    )
                out["media_id"].append(mid)
                out["fmt"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(mv)
                out["n_pixels"].append(w * h)
                out["pixel_sum"].append(psum)
                out["mean_pixel"].append(psum // (w * h))
                out["rs_width"].append(rs.shape[1])
                out["rs_height"].append(rs.shape[0])
                out["rs_pixel_sum"].append(int(rs.sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=_DECODE_PGM_SCHEMA)
