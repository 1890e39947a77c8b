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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, fake_width int, fake_height int"
)


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
