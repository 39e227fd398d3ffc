"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct; decode / feature-extraction run as Arrow-batched
`mapInPandas` operators.  The actual codec libraries (Pillow, ffmpeg,
torchaudio...) are NOT in this container, so the decode kernels are
deterministic stubs behind an import-gate — the Spark-side plumbing
(schema, batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder, if ever available
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False

try:  # real audio decoder, if ever available
    import soundfile  # noqa: F401

    HAVE_SOUNDFILE = True
except Exception:
    HAVE_SOUNDFILE = False


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: binary payload column + typed meta.

    Here the payload is the UTF-8 text bytes (the container has no
    media files); in production this is `spark.read.format
    ("binaryFile")` or parquet with a binary column.
    """
    return df.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _stub_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake of an image decode: width/height/frames
    derived from the payload digest.  Replace with PIL when present."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 4
    return width, height, n_frames


def decode_media(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas.

    Arrow-batched: each pandas batch holds many payloads; per-batch
    Python overhead is amortized.  The decode kernel is a stub (see
    module docstring) — with a real codec installed, only
    `_stub_decode` changes; the distributed plumbing is identical.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if HAVE_PIL:
                raise NotImplementedError(
                    "real image decode not wired; container has no media libs"
                )
            dims = [_stub_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()
                    ),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "n_frames": pd.Series([d[2] for d in dims], dtype="int32"),
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def media_meta_sql(df: DataFrame) -> DataFrame:
    """SQL-expressible slice of the multimodal surface (oracle-checked):
    byte length + sha256 over the binary payload, JVM-side only."""
    return df.select(
        "doc_id",
        F.octet_length("payload").cast("int").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha_hex"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_media(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stage: binary-in → binary-out mapInPandas (the shape a
    real thumbnailer has: payload transformed per row, metadata
    updated, schema preserved for the next stage).  The kernel is a
    deterministic stub — payload re-keyed by digest + target dims so
    outputs are stable; with Pillow present only the kernel body
    changes.  No shuffle: narrow map over whatever partitioning the
    payload table already has."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": pdf["payload"].map(
                        lambda p: hashlib.sha256(
                            bytes(p) + f"{width}x{height}".encode()
                        ).digest()
                    ),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )
            yield out

    return df.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: each payload row EXPANDS to one row per kept
    frame (frame count from the stub decode, keep every ``every_n``-th
    frame starting at 0) — the UDTF shape of video processing, where
    output cardinality exceeds input.  mapInPandas yields the expanded
    frame batches directly; at 100 TB the expansion happens inside the
    task that holds the payload, so no shuffle until someone groups
    frames."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                _, _, n_frames = _stub_decode(p)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(hashlib.sha256(p + bytes([i])).digest())
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "frame_idx": pd.Series(idxs, dtype="int32"),
                        "frame": frames,
                    }
                )

    return df.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def _phash_sign_table() -> "object":
    """65536×1 uint64 word table (one per byte-bigram value) from the
    repo's fixed LCG — bit j of word[v] is the ±1 sign of bigram v on
    hash bit j.  Built once per executor import, ~512 KB."""
    import numpy as np

    state = np.uint64(0x9E3779B97F4A7C15)
    mult = np.uint64(6364136223846793005)
    inc = np.uint64(1442695040888963407)
    out = np.empty(65536, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(65536):
            state = state * mult + inc
            # xorshift mix so low bits aren't LCG-weak
            out[i] = state ^ (state >> np.uint64(33))
    return out


def phash64(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit locality-sensitive fingerprint of a BINARY payload:
    SimHash over byte bigrams (counts-weighted signed sums, sign bit
    per hash position).  Payloads differing in a few bytes flip few
    bits — the binary analog of text SimHash and the stand-in for a
    real image pHash (DCT) until codecs exist; the Spark-side shape
    (Arrow kernel → 64-bit column → pigeonhole Hamming join) is the
    production one either way.

    Kernel cost: per payload, one np.unique over its bigrams + a
    (k×64) sign expansion — vectorized per Arrow batch, no Python
    per-byte loops.
    """
    import numpy as np

    table = _phash_sign_table()
    bitpos = np.arange(64, dtype=np.uint64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf[payload_col]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(b) < 2:
                    hashes.append(0)
                    continue
                bigrams = b[:-1].astype(np.uint32) * 256 + b[1:]
                uniq, counts = np.unique(bigrams, return_counts=True)
                words = table[uniq]  # (k,) uint64
                signs = (
                    ((words[:, None] >> bitpos) & np.uint64(1)).astype(np.int64)
                    * 2
                    - 1
                )  # (k, 64) in {-1, +1}
                s = counts.astype(np.int64) @ signs  # (64,)
                h = ((s > 0).astype(np.uint64) << bitpos).sum(dtype=np.uint64)
                hashes.append(int(h.astype(np.int64)))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "phash": pd.Series(hashes, dtype="int64")}
            )

    id_type = df.select(F.col(id_col)).schema.fields[0].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField("phash", T.LongType(), True),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, schema=schema)


def phash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 8,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Binary near-duplicate pairs: phash64 signatures through the
    guaranteed-recall pigeonhole Hamming joiner shared with text
    SimHash (operators/dedup.hamming_near_pairs) — candidates only
    from chunk-bucket collisions, never all-pairs."""
    from . import dedup as D

    sig = D.track(phash64(df, id_col, payload_col).cache())
    return D.hamming_near_pairs(
        sig, id_col, "phash", max_hamming, max_bucket_size
    )


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("window_id", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def audio_energy_windows(df: DataFrame, n_windows: int = 4) -> DataFrame:
    """Audio branch of the multimodal surface: decode a binary payload
    to PCM samples and emit fixed-window energy — the first stage of
    VAD-style segmentation / silence trimming in an audio curation
    pipeline.

    The decode kernel is the honest fake (container has no audio
    libs): 32 deterministic 8-bit 'samples' are the payload's sha256
    digest bytes, split into ``n_windows`` equal windows; per window
    it emits Σ sample² (exact integer energy — order-free, oracleable)
    and the peak sample.  With soundfile/librosa present only the
    sample extraction changes — the Arrow batching, fan-out shape
    (one row per (payload, window)), and integer-exact energy
    arithmetic are the real plumbing.  Windows are row-local: no
    shuffle at any corpus size.
    """
    if 32 % n_windows:
        raise ValueError(f"n_windows ({n_windows}) must divide 32")
    win = 32 // n_windows

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, wids, ns, es, pk = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if HAVE_SOUNDFILE:
                    raise NotImplementedError(
                        "real audio decode not wired; container has no "
                        "audio libs"
                    )
                samples = hashlib.sha256(bytes(payload)).digest()
                for w in range(n_windows):
                    chunk = samples[w * win : (w + 1) * win]
                    ids.append(doc_id)
                    wids.append(w)
                    ns.append(win)
                    es.append(sum(b * b for b in chunk))
                    pk.append(max(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_id": pd.Series(wids, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy": pd.Series(es, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return df.mapInPandas(kernel, schema=AUDIO_ENERGY_SCHEMA)
