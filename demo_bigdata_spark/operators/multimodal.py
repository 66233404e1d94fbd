"""Multimodal columns [EXT]: opaque binary payloads + typed metadata, with
Arrow-batched Pandas-UDF plumbing for decode/feature-extract/frame-sample.

Design (north star): image/audio/video live as ``binary`` columns next to a
metadata struct (mime, n_bytes, sha256). Decoders are Pandas UDFs over
``mapInPandas`` — Arrow batches in/out, one Python invocation per batch, not
per row. PIL/ffmpeg are NOT in this container, but PNG needs only stdlib
zlib: ``decode_image_real`` decodes real PNG pixels via functions/png.py
(audio/video formats would need their libs and keep fake twins);
``decode_image_fake`` produces deterministic pseudo-features from raw bytes
for payloads that aren't images at all.

At 100 TB: binary payloads dominate I/O — store them in their own parquet
column (never inline in JSON), filter on metadata FIRST so pushdown prunes
row groups before bytes are read, and size partitions by bytes not rows
(``spark.sql.files.maxPartitionBytes``). mapInPandas streams batches, so
executor memory is bounded by batch size, not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque binary payload + typed metadata from a source
    column (here: utf-8 bytes of text, standing in for real media bytes).
    All metadata is computed JVM-side (encode/sha2/length) — portable and
    oracle-checkable."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )


IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode over Arrow batches — pure-stdlib PNG codec
    (functions/png.py: zlib inflate + scanline unfilter), no PIL/libvips
    needed. Same mapInPandas shape as the fake twin; a payload that is not a
    decodable PNG yields NULL features plus a per-row ``decode_error``
    instead of failing the batch (at 100 TB a corrupt blob must never kill
    the job — quarantine rows by filtering ``decode_error IS NOT NULL``)."""
    from demo_bigdata_spark.functions.png import decode_png

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, lumas, errs = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(doc_id)
                try:
                    w, h, luma = decode_png(bytes(payload))
                    ws.append(w)
                    hs.append(h)
                    lumas.append(round(luma, 4))
                    errs.append(None)
                except Exception as e:  # corrupt/unsupported payload
                    ws.append(None)
                    hs.append(None)
                    lumas.append(None)
                    errs.append(str(e)[:200])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "mean_luma": pd.array(lumas, dtype="Float64"),
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(_decode, IMAGE_DECODE_SCHEMA)


def decode_image_fake(media: DataFrame) -> DataFrame:
    """Deterministic fake decoder exercising the REAL scale plumbing:
    mapInPandas over Arrow batches, bounded memory, typed output schema.
    Features derive from the payload bytes so results are stable."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.str.len().astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    # raw double, no rounding: the int/int division is
                    # bit-identical across engines, while pandas .round is
                    # banker's and SQL round() is half-away — a tie at the
                    # 4th decimal would diverge (dyadic sums /64 CAN tie)
                    "mean_luma": payloads.map(
                        lambda b: (sum(b[:64]) / max(min(len(b), 64), 1)) if len(b) else 0.0
                    ),
                }
            )

    return media.mapInPandas(_decode, IMAGE_FEATURES_SCHEMA)


def frame_sample_fake(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Deterministic fake frame sampler ("video" = byte stream; one frame per
    ``every_n_bytes`` chunk, capped). Shows the fan-out shape: one input row ->
    N output rows, still Arrow-batched."""
    import hashlib

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_sha = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(max(len(payload) // every_n_bytes, 1), max_frames)
                for i in range(n_frames):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_sha.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame({"doc_id": out_ids, "frame_idx": out_idx, "frame_sha": out_sha})

    return media.mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy_sum", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_windows_fake(
    media: DataFrame,
    window_bytes: int = 32,
    max_windows: int = 4,
    center: int = 64,
) -> DataFrame:
    """Deterministic fake audio featurizer — the waveform-analysis member
    of the media tier (image decode / video frame-sample / AUDIO window):
    treat the payload as 8-bit PCM centered at ``center``, emit per-window
    sample count, energy (sum of squared amplitudes) and zero-crossing
    count (strict sign flips, a*b < 0). One input row fans out to at most
    ``max_windows`` rows, Arrow-batched via mapInPandas — the real
    streaming-DSP plumbing with a stub transform (a real decoder swaps in
    soundfile/librosa without touching the shape). All-integer features:
    exactly replayable from byte values on any engine."""

    def _win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, es, zs = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                nw = min(max(len(payload) // window_bytes, 1), max_windows)
                for w in range(nw):
                    chunk = payload[w * window_bytes : (w + 1) * window_bytes]
                    vals = [b - center for b in chunk]
                    ids.append(doc_id)
                    idxs.append(w)
                    ns.append(len(vals))
                    es.append(sum(v * v for v in vals))
                    zs.append(
                        sum(1 for a, b in zip(vals, vals[1:]) if a * b < 0)
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": idxs,
                    "n_samples": ns,
                    "energy_sum": es,
                    "zero_crossings": zs,
                }
            )

    return media.mapInPandas(_win, AUDIO_FEATURES_SCHEMA)


AUDIO_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy_sum", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_audio_real(media: DataFrame) -> DataFrame:
    """REAL audio decode over Arrow batches — stdlib PCM WAV codec
    (functions/wav.py, the audio mirror of the PNG story): per payload the
    channel count, sample rate, mono sample count, integer energy sum and
    strict zero-crossing count, computed from the DECODED waveform. Same
    mapInPandas shape and quarantine posture as ``decode_image_real``: a
    payload that is not a PCM WAV yields NULL features plus a per-row
    ``decode_error`` instead of failing the batch."""
    from demo_bigdata_spark.functions.wav import decode_wav

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chs, rates, ns, es, zs, errs = [], [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(doc_id)
                try:
                    nch, rate, mono = decode_wav(bytes(payload))
                    chs.append(nch)
                    rates.append(rate)
                    ns.append(len(mono))
                    es.append(sum(v * v for v in mono))
                    zs.append(
                        sum(1 for a, b in zip(mono, mono[1:]) if a * b < 0)
                    )
                    errs.append(None)
                except Exception as e:  # corrupt/unsupported payload
                    chs.append(None)
                    rates.append(None)
                    ns.append(None)
                    es.append(None)
                    zs.append(None)
                    errs.append(str(e)[:200])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_channels": pd.array(chs, dtype="Int32"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int32"),
                    "energy_sum": pd.array(es, dtype="Int64"),
                    "zero_crossings": pd.array(zs, dtype="Int32"),
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(_decode, AUDIO_DECODE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)


def resize_image_fake(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Deterministic fake resize exercising the real plumbing (the decode
    tier's sibling: PIL's Image.resize would slot into the same loop).
    'Resizing' = aspect-preserving dimension math from the fake-decoded
    (width, height) plus a byte-stride downsample of the payload standing in
    for pixel resampling — output is a stable function of the input bytes."""
    import hashlib

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].str.len().astype("int64")
            w = (n % 640 + 1).astype("int64")  # matches decode_image_fake
            h = (n % 480 + 1).astype("int64")
            scale = (w.combine(h, max) / max_side).clip(lower=1.0)
            out_w = (w / scale).astype("int32").clip(lower=1)
            out_h = (h / scale).astype("int32").clip(lower=1)
            stride = scale.astype("int64").clip(lower=1)
            sha = [
                hashlib.sha256(bytes(p[::s])).hexdigest()[:16]
                for p, s in zip(pdf["payload"], stride)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "resized_sha": sha,
                }
            )

    return media.mapInPandas(_resize, RESIZED_SCHEMA)
