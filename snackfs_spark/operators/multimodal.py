"""Multimodal-column operators (SURVEY.md §2.C / BASELINE.md): treat
image/audio/video payloads as opaque binary columns with typed metadata;
decode/feature-extract runs as Arrow-batched Pandas UDFs over
mapInPandas.

The container has no image/audio libraries, so the decode step is a
clearly marked stub (deterministic fake features keyed on byte length) —
the Spark-side plumbing (binary schema, batch iteration, output schema,
partition preservation) is real and tested. Payload bytes derive from
document text (utf-8), so metadata queries stay oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snackfs_spark.registry import register
from snackfs_spark.sources.tables import fan_out, load_table

_DOC_PATH_SQL = "'/data/' || source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt'"


def binary_assets_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table shape: opaque binary payload + typed metadata
    struct. At scale this is what `spark.read.format("binaryFile")` or a
    parquet table with a binary column yields."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").cast("long").alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


@register(
    "multimodal_metadata",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           hex(encode(substr(text, 1, 4))) AS magic,
           source AS origin
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: byte length and a
    magic-prefix probe — the scan-only operations that never decode.
    Column-pruned: at 100 TB the payload column is untouched unless the
    magic probe needs its first bytes."""
    assets = binary_assets_df(spark, sf_dir)
    return assets.select(
        "asset_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.hex(F.expr("substring(payload, 1, 4)")).alias("magic"),
        F.col("meta.origin").alias("origin"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        # double, not float: the oracle reproduces these values in float64
        # arithmetic, and a float32 round-trip would perturb them.
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)

FEATURE_DIM = 8


def _decode_and_featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode: a real deployment would decode image/audio bytes here
    (PIL/librosa are not in this container). The deterministic fake keys
    features on payload bytes so tests pin the plumbing: Arrow batches
    in, vectorized transform, Arrow batches out."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        feats = [
            [float((nb * (d + 1)) % 256) / 255.0 for d in range(FEATURE_DIM)]
            for nb in n_bytes
        ]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "n_bytes": n_bytes.astype("int64"),
                "feature": feats,
            }
        )


def decode_features_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode pipeline: per-partition Arrow batches, no
    shuffle — decode parallelism equals scan parallelism."""
    # fan_out: decode parallelism must match cores even when the source
    # is one unsplittable file; at real scale (multi-file) it's a no-op.
    assets = fan_out(binary_assets_df(spark, sf_dir), spark)
    return assets.select("asset_id", "payload").mapInPandas(
        _decode_and_featurize, schema=_FEATURE_SCHEMA
    )


@register(
    "multimodal_decode_features",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(((octet_length(encode(text)) * 1) % 256) AS DOUBLE) / 255.0 AS f0,
           CAST(((octet_length(encode(text)) * {FEATURE_DIM}) % 256) AS DOUBLE) / 255.0
             AS f{FEATURE_DIM - 1}
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract through the Pandas-UDF path, projected to
    scalar columns so the oracle can check the batch plumbing end-to-end
    (first and last feature components)."""
    feats = decode_features_df(spark, sf_dir)
    return feats.select(
        "asset_id",
        "n_bytes",
        F.element_at("feature", 1).cast("double").alias("f0"),
        F.element_at("feature", FEATURE_DIM).cast("double").alias(f"f{FEATURE_DIM - 1}"),
    )


FRAME_STRIDE = 64


def frame_sample_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: slice each binary
    payload into fixed-stride 'frames' (explode over computed offsets) —
    (asset_id, frame_idx, frame_bytes). The real decoder is the stub
    above; the partitioning/explode shape is what matters at scale."""
    assets = fan_out(binary_assets_df(spark, sf_dir), spark)
    return (
        assets.select(
            "asset_id",
            "payload",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.octet_length("payload") - 1) / FRAME_STRIDE, F.lit(0)
                    ).cast("int"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "asset_id",
            "frame_idx",
            F.expr(
                f"substring(payload, frame_idx * {FRAME_STRIDE} + 1, {FRAME_STRIDE})"
            ).alias("frame_bytes"),
        )
    )


@register(
    "multimodal_frame_sample",
    # Chunked payload iteration parity (reference §2.A #27-35,
    # FileSystemOutputStream.scala:55-120): the oracle recomputes each
    # frame's offset/length/md5 from the source text — byte slices equal
    # char slices because the corpus is ascii (asserted in tests).
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(i * {FRAME_STRIDE} AS BIGINT) AS frame_offset,
           CAST(length(substr(text, CAST(i * {FRAME_STRIDE} + 1 AS INT), {FRAME_STRIDE}))
                AS BIGINT) AS frame_len,
           md5(substr(text, CAST(i * {FRAME_STRIDE} + 1 AS INT), {FRAME_STRIDE}))
             AS frame_md5
    FROM (
      SELECT doc_id, text,
             unnest(range(0, greatest((n_chars - 1) // {FRAME_STRIDE}, 0) + 1)) AS i
      FROM documents
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling, projected to SQL-expressible scalars per frame
    (offset, length, content md5) so the chunk iteration is hash-checked
    end-to-end, not just row-counted."""
    frames = frame_sample_df(spark, sf_dir)
    return frames.select(
        "asset_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx").cast("long") * FRAME_STRIDE).alias("frame_offset"),
        F.octet_length("frame_bytes").cast("long").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

RESIZE_TARGET = 32


def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize: a real deployment decodes the image and resamples
    pixels (PIL is not in this container). The deterministic stand-in
    strided-samples the payload down to RESIZE_TARGET bytes, preserving
    the real contract: binary in, fixed-size binary out, vectorized per
    Arrow batch."""
    for pdf in batches:
        out_ids, out_n, out_b = [], [], []
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            b = bytes(payload)
            n = len(b)
            stride = max(n // RESIZE_TARGET, 1)
            sampled = b[::stride][:RESIZE_TARGET]
            out_ids.append(aid)
            out_n.append(n)
            out_b.append(sampled.ljust(RESIZE_TARGET, b"\x00"))
        yield pd.DataFrame(
            {"asset_id": out_ids, "orig_bytes": out_n, "resized": out_b}
        )


def resize_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw mapInPandas resize pipeline (binary out)."""
    assets = fan_out(binary_assets_df(spark, sf_dir), spark)
    return assets.select("asset_id", "payload").mapInPandas(
        _resize, schema=_RESIZE_SCHEMA
    )


@register(
    "multimodal_resize",
    # The oracle re-derives the strided byte sampling in SQL. Valid while
    # every payload has >= RESIZE_TARGET bytes (fixture docs are 100+
    # chars, asserted in tests), so the \\x00 padding branch never fires
    # and byte indexing equals char indexing (ascii corpus).
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(n_chars AS BIGINT) AS orig_bytes,
           CAST({RESIZE_TARGET} AS BIGINT) AS resized_len,
           md5(array_to_string(
             list_transform(range(0, {RESIZE_TARGET}),
               j -> substr(text, CAST(j * greatest(n_chars // {RESIZE_TARGET}, 1) + 1 AS INT), 1)),
             '')) AS resized_md5
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize through the Pandas-UDF path (mapInPandas, narrow — resize
    parallelism equals scan parallelism), projected to scalars (original
    size, resized size, content md5) so the Arrow batch plumbing is
    hash-checked against the oracle's SQL re-derivation."""
    out = resize_df(spark, sf_dir)
    return out.select(
        "asset_id",
        "orig_bytes",
        F.octet_length("resized").cast("long").alias("resized_len"),
        F.md5("resized").alias("resized_md5"),
    )


AUDIO_FRAME = 64  # samples per analysis frame

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def _pcm_frame_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode (not a stub): payload bytes are parsed as int16
    little-endian PCM with numpy.frombuffer — the exact operation an
    audio pipeline runs before VAD/resampling — and per-frame energy
    (sum of squared samples) and peak are computed vectorized. Outputs
    are integers, so the DuckDB oracle reproduces them exactly from the
    source text's character codes."""
    import numpy as np

    for pdf in batches:
        out_id, out_fi, out_ns, out_en, out_pk = [], [], [], [], []
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            buf = bytes(payload)
            usable = len(buf) - (len(buf) % 2)
            samples = np.frombuffer(buf[:usable], dtype="<i2").astype(np.int64)
            n_frames = len(samples) // AUDIO_FRAME
            for f in range(n_frames):
                fr = samples[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME]
                out_id.append(aid)
                out_fi.append(f)
                out_ns.append(len(fr))
                out_en.append(int((fr * fr).sum()))
                out_pk.append(int(np.abs(fr).max()))
        yield pd.DataFrame(
            {
                "asset_id": pd.Series(out_id, dtype="int64"),
                "frame_idx": pd.Series(out_fi, dtype="int64"),
                "n_samples": pd.Series(out_ns, dtype="int64"),
                "energy": pd.Series(out_en, dtype="int64"),
                "peak": pd.Series(out_pk, dtype="int64"),
            }
        )


@register(
    "multimodal_audio_energy",
    oracle=f"""
    WITH samples AS (
      SELECT doc_id AS asset_id, i AS sample_idx,
             -- int16 LE from two adjacent bytes; payload bytes are the
             -- text's character codes (ASCII corpus), so ascii() IS the
             -- byte value the engine-side frombuffer sees
             (ascii(substr(text, 2 * i + 1, 1))
              + 256 * ascii(substr(text, 2 * i + 2, 1))
              - CASE WHEN ascii(substr(text, 2 * i + 2, 1)) >= 128
                     THEN 65536 ELSE 0 END) AS s
      FROM (
        SELECT doc_id, text,
               unnest(range(0, octet_length(encode(text)) // 2)) AS i
        FROM documents
      )
    )
    SELECT asset_id,
           sample_idx // {AUDIO_FRAME} AS frame_idx,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MAX(abs(s)) AS BIGINT) AS peak
    FROM samples
    GROUP BY asset_id, sample_idx // {AUDIO_FRAME}
    HAVING COUNT(*) = {AUDIO_FRAME}
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction through the REAL decode path: int16-LE
    PCM parsing (numpy frombuffer over Arrow batches) + per-frame
    energy/peak — unlike the codec stubs, nothing here is faked, because
    PCM needs no external library. mapInPandas preserves partitioning
    (decode parallelism = scan parallelism, zero shuffle); per-frame
    rows explode AFTER decode, inside the same task. Integer outputs
    make the whole chain bit-exact against the oracle. At 100 TB this
    is the template for every samples-domain feature (VAD, loudness,
    clipping detection): one pass, no shuffle, Arrow-vectorized."""
    assets = fan_out(binary_assets_df(spark, sf_dir), spark)
    return assets.select("asset_id", "payload").mapInPandas(
        _pcm_frame_energy, schema=_AUDIO_SCHEMA
    )


IMG_W = 32        # synthetic scanline width (bytes per row)
TILE_H = 8        # rows per tile -> each tile is TILE_H * IMG_W pixels

_TILE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("tile_idx", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("brightness_sum", T.LongType()),
        T.StructField("px_min", T.LongType()),
        T.StructField("px_max", T.LongType()),
    ]
)


def _tile_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL pixel math (not a stub): payload bytes are reshaped into
    IMG_W-wide grayscale scanlines with numpy (truncating the ragged
    tail, as a fixed-geometry decoder would) and per-tile brightness
    sum / min / max are computed vectorized — the thumbnail/exposure
    screening pass of an image pipeline. Integer outputs, so the oracle
    reproduces them from character codes exactly."""
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in ("asset_id", "tile_idx", "n_px", "brightness_sum", "px_min", "px_max")}
        for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
            buf = np.frombuffer(bytes(payload), dtype=np.uint8)
            n_rows = len(buf) // IMG_W
            n_tiles = n_rows // TILE_H
            if not n_tiles:
                continue
            img = buf[: n_tiles * TILE_H * IMG_W].reshape(n_tiles, TILE_H * IMG_W)
            sums = img.sum(axis=1, dtype=np.int64)
            mins = img.min(axis=1)
            maxs = img.max(axis=1)
            for t in range(n_tiles):
                out["asset_id"].append(aid)
                out["tile_idx"].append(t)
                out["n_px"].append(TILE_H * IMG_W)
                out["brightness_sum"].append(int(sums[t]))
                out["px_min"].append(int(mins[t]))
                out["px_max"].append(int(maxs[t]))
        yield pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})


@register(
    "multimodal_image_tiles",
    oracle=f"""
    WITH px AS (
      SELECT doc_id AS asset_id,
             i // {TILE_H * IMG_W} AS tile_idx,
             ascii(substr(text, CAST(i + 1 AS INT), 1)) AS p
      FROM (
        SELECT doc_id, text,
               unnest(range(0,
                 (octet_length(encode(text)) // {IMG_W * TILE_H}) * {IMG_W * TILE_H}))
                 AS i
        FROM documents
      )
    )
    SELECT asset_id, tile_idx,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(p) AS BIGINT) AS brightness_sum,
           CAST(MIN(p) AS BIGINT) AS px_min,
           CAST(MAX(p) AS BIGINT) AS px_max
    FROM px GROUP BY asset_id, tile_idx
    """,
)
def multimodal_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-modality twin of the PCM path: payloads decode as
    fixed-width grayscale scanlines (numpy reshape — real pixel math,
    no codec needed) and each {TILE_H}x{IMG_W} tile reports brightness
    sum / min / max — the exposure/blank-frame screening pass every
    image ingest runs before expensive models. Zero shuffle: decode and
    tile stats live in one mapInPandas pass at scan parallelism;
    integer outputs keep the oracle bit-exact. The ragged tail is
    truncated exactly as the fixed-geometry oracle does."""
    assets = fan_out(binary_assets_df(spark, sf_dir), spark)
    return assets.select("asset_id", "payload").mapInPandas(
        _tile_stats, schema=_TILE_SCHEMA
    )
