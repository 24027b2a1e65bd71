"""Multimodal column plumbing (SURVEY.md north-star extension).

Images/audio/video are opaque ``binary`` columns paired with a typed
metadata struct. The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing — is real and tested; the
actual codec step is stubbed (image/audio libraries are not in this
container) behind a clearly marked NotImplementedError with a deterministic
fake decoder for the 'fake/raw' format.

At 100 TB the decode stage is the canonical mapInPandas workload: pure
map-side (no shuffle), Arrow-batched, CPU-bound — scale by input splits and
``spark.sql.files.maxPartitionBytes``."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("head_u32", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach a deterministic opaque binary payload (md5 digest bytes of the
    text) + typed metadata — the storage contract for multimodal columns."""
    data = F.unhex(F.md5(F.col(text_col)))
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        ((F.col(id_col) % 64) + 1).cast("int").alias("width"),
        ((F.col(id_col) % 48) + 1).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
    )
    return df.select(F.col(id_col), data.alias("media"), meta.alias("media_meta"))


def _decode_one(fmt: str, payload: bytes) -> bytes:
    if fmt == "fake/raw":
        return payload  # deterministic fake decode: identity
    # Real codecs (PIL/libav/soundfile) are not available in this container.
    raise NotImplementedError(f"no decoder for format {fmt!r}: plug a codec here")


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media, media_meta).

    Arrow-batched: each partition arrives as an iterator of pandas frames;
    output schema is fixed (FEATURE_SCHEMA) so downstream plans are stable."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_one(m["format"], bytes(b))
                for m, b in zip(pdf["media_meta"], pdf["media"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": [len(b) for b in decoded],
                    "head_u32": [
                        struct.unpack(">I", b[:4])[0] if len(b) >= 4 else 0
                        for b in decoded
                    ],
                    "width": [m["width"] for m in pdf["media_meta"]],
                    "height": [m["height"] for m in pdf["media_meta"]],
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def resize_media(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """mapInPandas resize over the (doc_id, media, media_meta) contract:
    same storage schema out, so it composes before ``extract_features`` /
    ``sample_frames``. For 'fake/raw' the deterministic fake 'resample' is
    cycle-repeat/truncate of the payload to target_w*target_h bytes; a real
    codec (PIL.Image.resize / libswscale) plugs into ``_resize_one``.
    Map-side only, Arrow-batched — the standard media-pipeline stage shape."""
    n_bytes = target_w * target_h
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META),
        ]
    )

    def _resize_one(fmt: str, payload: bytes) -> bytes:
        if fmt == "fake/raw":
            reps = -(-n_bytes // max(len(payload), 1))
            return (payload * reps)[:n_bytes]
        raise NotImplementedError(f"no resizer for format {fmt!r}: plug a codec here")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = [
                _resize_one(m["format"], bytes(b))
                for m, b in zip(pdf["media_meta"], pdf["media"])
            ]
            meta = [
                {
                    "format": m["format"],
                    "width": target_w,
                    "height": target_h,
                    "n_frames": m["n_frames"],
                }
                for m in pdf["media_meta"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media": media,
                    "media_meta": meta,
                }
            )

    return df.mapInPandas(fn, out_schema)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling stub for video payloads: emits (doc_id, frame_idx)
    rows for frames 0, every_n, 2*every_n, ... of media_meta.n_frames.
    Pure JVM-side sequence/explode — the decode of each sampled frame would
    chain into ``extract_features``."""
    idx = F.sequence(F.lit(0), F.col("media_meta.n_frames") - 1, F.lit(every_n))
    return df.select("doc_id", F.explode(idx).alias("frame_idx"))


def perceptual_hash(df: DataFrame) -> DataFrame:
    """pHash-style 64-bit perceptual hash over the (doc_id, media,
    media_meta) contract: resize to 8x8, then bit i = (pixel_i > mean) —
    near-identical images land at small Hamming distance. The resize goes
    through ``resize_media`` (real codec plugs in there; the fake path is
    deterministic), the thresholding is one Arrow-batched numpy pass.
    Output: (doc_id, phash:long). Map-side only."""
    import numpy as np

    small = resize_media(df, 8, 8)
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("phash", T.LongType())]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(64, dtype=np.uint64))
        for pdf in batches:
            hashes = []
            for b in pdf["media"]:
                px = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int32)
                bits = (px > px.mean()).astype(np.uint64)
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    # numpy uint64 -> signed int64 wrap for Spark LongType
                    "phash": pd.array(
                        [h - (1 << 64) if h >= (1 << 63) else h for h in hashes],
                        dtype="int64",
                    ),
                }
            )

    return small.mapInPandas(fn, out_schema)


def phash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Hamming near-dup pairs over 64-bit perceptual hashes WITHOUT the
    all-pairs scan: multi-index pigeonhole banding. Split each hash into
    ``bands`` equal bit-slices; two hashes within ``max_hamming`` bits
    (max_hamming < bands) MUST agree on at least one whole slice, so the
    equi self-join on (band, slice value) has recall 1.0 by construction
    (unlike probabilistic LSH) and the exact bit_count verify removes the
    false positives. Shuffle = |docs| x bands tiny tuples."""
    if max_hamming >= bands:
        raise ValueError("pigeonhole needs max_hamming < bands")
    width = 64 // bands
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("phash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for i in range(bands)
        ]
    )
    banded = hashes.select("doc_id", "phash", F.explode(slices).alias("b")).select(
        "doc_id", "phash", "b.band", "b.bv"
    )
    a, b = banded.alias("a"), banded.alias("b")
    from .dedupfns import hamming

    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming(F.col("a.phash"), F.col("b.phash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


AUDIO_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
    ]
)


def attach_fake_audio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", blocks: int = 8
) -> DataFrame:
    """Attach a deterministic fake PCM16 payload: ``blocks`` chained md5
    digests of the text (so samples do NOT repeat with the digest period)
    interpreted downstream as little-endian int16 mono — the storage
    contract for audio columns (opaque binary + typed metadata), mirroring
    ``attach_fake_media`` for images."""
    payload = F.concat(
        *[F.unhex(F.md5(F.concat(F.col(text_col), F.lit(str(i))))) for i in range(blocks)]
    )
    meta = F.struct(
        F.lit("fake/pcm16").alias("format"),
        F.lit(16000).cast("int").alias("sample_rate"),
        F.lit(1).cast("int").alias("n_channels"),
        F.lit(blocks * 8).cast("int").alias("n_samples"),
    )
    return df.select(F.col(id_col), payload.alias("audio"), meta.alias("audio_meta"))


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def audio_frame_energy(df: DataFrame, frame_len: int = 16) -> DataFrame:
    """mapInPandas audio framing over the (doc_id, audio, audio_meta)
    contract: decode PCM16 ('fake/pcm16' = raw little-endian int16; a real
    codec — soundfile/libav — plugs into the same branch), split into
    ``frame_len``-sample frames, emit integer absolute energy per frame
    (sum |sample|) — the VAD/silence-trim primitive of an audio training
    pipeline. Integer energies keep the op oracle-checkable cross-engine.
    Map-side only, Arrow-batched, scales by input splits."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            fidx: list[int] = []
            energy: list[int] = []
            for did, m, b in zip(pdf["doc_id"], pdf["audio_meta"], pdf["audio"]):
                if m["format"] != "fake/pcm16":
                    raise NotImplementedError(
                        f"no audio decoder for format {m['format']!r}: plug a codec here"
                    )
                samples = np.frombuffer(bytes(b), dtype="<i2").astype(np.int64)
                n_frames = len(samples) // frame_len
                e = (
                    np.abs(samples[: n_frames * frame_len])
                    .reshape(n_frames, frame_len)
                    .sum(axis=1)
                )
                ids.extend([int(did)] * n_frames)
                fidx.extend(range(n_frames))
                energy.extend(int(x) for x in e)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(fidx, dtype="int32"),
                    "energy": pd.array(energy, dtype="int64"),
                }
            )

    return df.mapInPandas(fn, AUDIO_FRAME_SCHEMA)
