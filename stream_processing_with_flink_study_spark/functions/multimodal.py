"""Multimodal (image/audio/video) column plumbing.

Media rides through the engine as opaque ``binary`` columns plus typed
metadata structs; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched pandas UDFs over ``mapInPandas`` so each task
processes a columnar batch of blobs without ever collecting to the
driver.

The actual codecs (PIL/librosa/av) are NOT in this container, so the
decode step is stubbed two ways:

- :func:`decode_stub` raises ``NotImplementedError`` with the wiring a
  real deployment plugs in;
- :func:`fake_decode_meta` produces deterministic metadata derived from
  the bytes themselves, so the Spark-side plumbing (schema, batch
  iteration, partitioning) is fully testable and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, fake_width int, fake_height int"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_len long, frame_md5 string"

RESIZE_SCHEMA = "doc_id long, n_bytes_out long, crop_md5 string"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encode a text column to binary — stands in for real media bytes
    so the binary-column path is exercised end-to-end."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_stub(payload: bytes):  # pragma: no cover - intentional stub
    """Real deployments replace this with e.g. PIL.Image.open(BytesIO(b)).
    The container has no media codecs, so the engine ships the plumbing
    and leaves the codec pluggable."""
    raise NotImplementedError(
        "media codecs not available in this environment; plug in "
        "PIL/librosa/av here (bytes -> decoded object)"
    )


def fake_decode_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in 'decode': metadata computed from the raw
    bytes (length, first byte, fake dimensions).  Runs as mapInPandas —
    the exact batch shape a real decoder uses."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            n_bytes = payload.map(len)
            first = payload.map(lambda b: b[0] if len(b) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "fake_width": (n_bytes % 640).astype("int64"),
                    "fake_height": (first.astype("int64") * 4) % 480,
                }
            )

    return df.select(id_col, "payload").mapInPandas(_decode, MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_len: int = 64,
    stride: int = 256,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling for video-ish payloads: one OUTPUT ROW per sampled
    frame — the 1→N mapInPandas fan-out a real keyframe extractor uses
    (a codec call per blob, several rows out).  Frame ``i`` is the
    ``frame_len``-byte slice at offset ``i·stride``; emitted iff it is
    frame 0 (every payload yields at least one frame, possibly empty) or
    its offset lies inside the payload.  The frame payload leaves as an
    md5 so the op is oracle-checkable; a real pipeline would carry the
    bytes."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n = len(payload)
                for i in range(max_frames):
                    if i > 0 and i * stride >= n:
                        break
                    frame = payload[i * stride : i * stride + frame_len]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(frame))
                    md5s.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_sample, FRAME_SCHEMA)


def crop_resize(
    df: DataFrame, id_col: str = "doc_id", target_bytes: int = 4096
) -> DataFrame:
    """Deterministic stand-in for media resize: crop the payload to
    ``target_bytes`` (a real deployment decodes, resizes, re-encodes in
    the same batch loop).  Binary in → binary out inside the worker; the
    crop leaves as (length, md5) for the oracle check."""

    def _crop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cropped = pdf["payload"].map(lambda b: b[:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes_out": cropped.map(len).astype("int64"),
                    "crop_md5": cropped.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_crop, RESIZE_SCHEMA)


def byte_histogram_features(
    df: DataFrame, payload_col: str = "payload", bins: int = 16
) -> DataFrame:
    """Feature extraction: L1-normalized histogram of the payload's
    high nibbles (``byte >> 4``) as ``array<double>`` — a deterministic
    stand-in with the exact shape of a real embedding UDF (Arrow-batched
    scalar pandas UDF, fixed-dim float vector out), so the output plugs
    straight into the similarity stack (brute_force_topk / ann_topk_lsh
    over ``features``)."""

    @pandas_udf(ArrayType(DoubleType()))
    def _features(payloads: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for b in payloads:
            arr = np.frombuffer(b, dtype=np.uint8)
            if arr.size == 0:
                out.append([0.0] * bins)
                continue
            hist = np.bincount(arr >> 4, minlength=bins).astype("float64")
            out.append((hist / hist.sum()).tolist())
        return pd.Series(out)

    return df.withColumn("features", _features(F.col(payload_col)))


AUDIO_CHUNK_SCHEMA = (
    "doc_id long, chunk_idx int, n_samples long, energy double, peak int"
)


def audio_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    chunk: int = 128,
    hop: int = 96,
    max_chunks: int = 6,
) -> DataFrame:
    """Overlapping waveform chunking for audio-ish payloads — the
    librosa ``frame`` shape (chunk length > hop ⇒ 25% overlap here),
    with per-chunk RMS-style features computed on the raw bytes as a
    deterministic stand-in for decoded PCM (``decode_stub`` marks where
    a real codec plugs in).  One output row per chunk: sample count,
    mean byte value ('energy') and peak byte — numpy over the byte
    buffer, zero Python per-sample work.  Chunk 0 is always emitted
    (silent/empty payloads still register), further chunks only while
    their hop offset lies inside the payload."""

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, es, ps = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n = len(payload)
                for i in range(max_chunks):
                    if i > 0 and i * hop >= n:
                        break
                    buf = np.frombuffer(
                        payload[i * hop : i * hop + chunk], dtype=np.uint8
                    )
                    ids.append(doc_id)
                    idxs.append(i)
                    ns.append(len(buf))
                    # floor(x·1e4 + 0.5)/1e4, not round(): byte means are
                    # exact multiples of 1/128, which lands on .xxxx5
                    # half-way points where Python banker's rounding and
                    # SQL half-up disagree (same convention as
                    # similarity.quantize_embeddings_int8)
                    es.append(
                        float(np.floor(buf.mean() * 1e4 + 0.5) / 1e4)
                        if len(buf)
                        else 0.0
                    )
                    ps.append(int(buf.max()) if len(buf) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(es, dtype="float64"),
                    "peak": pd.Series(ps, dtype="int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _chunks, AUDIO_CHUNK_SCHEMA
    )
