"""Multimodal (image/audio/video) column plumbing.

Media rides through the engine as opaque ``binary`` columns plus typed
metadata structs; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched pandas UDFs over ``mapInPandas`` so each task
processes a columnar batch of blobs without ever collecting to the
driver.

Decode is REAL for uncompressed containers — :func:`decode_wav_pcm16`
(RIFF chunk walk + int16 PCM frames) and :func:`decode_bmp24`
(BITMAPFILEHEADER/BITMAPINFOHEADER + 4-byte-padded bottom-up BGR rows)
are pure-numpy parsers needing no codec library, dispatched by magic
bytes via :func:`decode_payload`.  Compressed codecs (JPEG/MP3/H.264…)
raise ``ValueError`` there with the plug-in point named — PIL/librosa/av
are not in this container, and those formats genuinely need them.
:func:`fake_decode_meta` remains as the format-agnostic deterministic
path for plumbing tests.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


# --------------------------------------------------------------------------
# real container codecs (pure numpy/struct — no media libraries needed)
# --------------------------------------------------------------------------
def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Serialize a mono int16 waveform as a canonical RIFF/WAVE file
    (PCM format tag 1, 16-bit, little-endian) — the writer half used to
    synthesize test corpora; real recordings arrive as these same bytes."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a RIFF/WAVE payload: walk the chunk list (not fixed
    offsets — real files carry LIST/INFO chunks between fmt and data),
    validate the PCM format tag, and view the data chunk as int16
    frames.  Returns (sample_rate, n_channels, samples[int16]) —
    samples shaped (n_frames, n_channels) for multi-channel audio.
    Pure numpy: the frame view is zero-copy off the payload buffer."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            fmt_chunk = payload[pos + 8 : pos + 8 + size]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("WAVE payload missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt_chunk)
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit PCM supported (format={audio_fmt}, bits={bits}); "
            "compressed audio needs a codec library plugged in here"
        )
    frames = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
    return rate, n_ch, frames.reshape(-1, n_ch)


def encode_bmp24(pix: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a canonical 24-bit BMP
    (BITMAPINFOHEADER, uncompressed, bottom-up, BGR byte order, rows
    padded to 4-byte boundaries) — the writer half for test corpora."""
    h, w, _ = pix.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pix[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def decode_bmp24(payload: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP: width/height/bpp come from the
    BITMAPINFOHEADER (never from the caller), the pixel array starts at
    the file header's offset, rows are 4-byte padded and stored
    bottom-up in BGR — returns (h, w, 3) uint8 RGB.  Pure numpy reshape
    + slice, no per-pixel Python."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _, _, _, px_off) = struct.unpack_from("<2sIHHI", payload, 0)
    hdr_size, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMPs supported (bpp={bpp}, "
            f"compression={comp})"
        )
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=px_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pix: np.ndarray, row_filter=None) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as a REAL PNG: IHDR
    (8-bit, color type 2, no interlace), one zlib-compressed IDAT of
    filtered scanlines, CRC32 on every chunk — stdlib ``zlib`` only.
    ``row_filter`` maps row index → filter type 0–4 (default cycles
    ``row % 5``), so encoded corpora exercise EVERY unfilter path
    (None / Sub / Up / Average / Paeth), not just the trivial one."""
    h, w, _ = pix.shape
    row_filter = row_filter or (lambda r: r % 5)
    raw = pix.astype(np.int64)
    out = bytearray()
    prev = np.zeros((w, 3), dtype=np.int64)
    for r in range(h):
        cur = raw[r]
        ft = int(row_filter(r))
        left = np.vstack([np.zeros((1, 3), dtype=np.int64), cur[:-1]])
        ul = np.vstack([np.zeros((1, 3), dtype=np.int64), prev[:-1]])
        if ft == 0:
            filt = cur
        elif ft == 1:  # Sub
            filt = cur - left
        elif ft == 2:  # Up
            filt = cur - prev
        elif ft == 3:  # Average
            filt = cur - (left + prev) // 2
        else:  # Paeth
            pred = np.empty_like(cur)
            for i in range(w):
                for ch in range(3):
                    pred[i, ch] = _paeth(
                        int(left[i, ch]), int(prev[i, ch]), int(ul[i, ch])
                    )
            filt = cur - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Parse a PNG: signature check, chunk walk (ancillary chunks
    skipped, multiple IDATs concatenated — real encoders split them),
    IHDR-driven dims, stdlib zlib inflate, then per-row unfiltering of
    all five scanline filters (None / Sub / Up / Average / Paeth, the
    full RFC 2083 set).  8-bit RGB (color type 2) non-interlaced only;
    other bit depths / palettes raise naming the PIL plug-in point.
    Returns (h, w, 3) uint8 — pure numpy + stdlib, no codec library."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, bytearray()
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT chunk")
    w, h, depth, ctype_n, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ctype_n != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit RGB non-interlaced PNGs supported natively "
            f"(depth={depth}, color={ctype_n}, interlace={interlace}); "
            "plug PIL in here for the rest"
        )
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong length")
    out = np.zeros((h, w, 3), dtype=np.int64)
    prev = np.zeros((w, 3), dtype=np.int64)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).reshape(w, 3).astype(np.int64)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):  # serial intra-row dependency
            cur = np.zeros((w, 3), dtype=np.int64)
            for i in range(w):
                for ch in range(3):
                    a = int(cur[i - 1, ch]) if i else 0
                    b = int(prev[i, ch])
                    c = int(prev[i - 1, ch]) if i else 0
                    if ft == 1:
                        pred = a
                    elif ft == 3:
                        pred = (a + b) // 2
                    else:
                        pred = _paeth(a, b, c)
                    cur[i, ch] = (int(row[i, ch]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = cur
        prev = cur
    return out.astype(np.uint8)


def decode_payload(payload: bytes):
    """Magic-byte dispatch to the native decoders: RIFF/WAVE →
    :func:`decode_wav_pcm16`, BM → :func:`decode_bmp24`, PNG →
    :func:`decode_png`.  Codecs beyond these (JPEG/MP3/MP4 …) genuinely
    require media libraries not present in this environment — they
    raise ``ValueError`` naming the plug-in point (PIL / librosa / av
    take the same bytes)."""
    if payload[:4] == b"RIFF":
        return decode_wav_pcm16(payload)
    if payload[:2] == b"BM":
        return decode_bmp24(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    raise ValueError(
        "unsupported container (supported natively: RIFF/WAVE PCM16, "
        "24-bit BMP, 8-bit RGB PNG); plug PIL/librosa/av in here for "
        "other codecs"
    )


WAV_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, sum_amp long,"
    " sum_sq long, peak int, trough int"
)

BMP_STATS_SCHEMA = (
    "doc_id long, width int, height int, sum_r long, sum_g long,"
    " sum_b long, max_px int, min_px int"
)


def synth_wav_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV corpus: per id, a mono PCM16 file of
    ``50 + id % 50`` samples, ``amp[i] = (id·37 + i·251) % 4001 − 2000``
    at ``8000 + (id % 8)·1000`` Hz — REAL RIFF bytes via
    :func:`encode_wav_pcm16`.  The closed form is what lets a SQL
    oracle state the decoded stats independently of the byte format,
    proving the decoder actually reads the container."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                n = 50 + d % 50
                i = np.arange(n, dtype=np.int64)
                amp = (d * 37 + i * 251) % 4001 - 2000
                payloads.append(
                    encode_wav_pcm16(amp, 8000 + (d % 8) * 1000)
                )
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth, "doc_id long, payload binary"
    )


def synth_bmp_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic BMP corpus: per id, a ``(2 + id % 3) ×
    (3 + id % 5)`` 24-bit image with channel values
    ``(id + 7·row + 13·col + 29·ch) % 256`` — REAL BMP bytes via
    :func:`encode_bmp24`.  Widths 3/5/6/7 make the row stride
    non-multiple-of-4, so the decoder's padding handling is genuinely
    exercised, not vacuously correct."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                h, w = 2 + d % 3, 3 + d % 5
                r = np.arange(h).reshape(h, 1, 1)
                c = np.arange(w).reshape(1, w, 1)
                ch = np.arange(3).reshape(1, 1, 3)
                pix = ((d + 7 * r + 13 * c + 29 * ch) % 256).astype(np.uint8)
                payloads.append(encode_bmp24(pix))
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth, "doc_id long, payload binary"
    )


def decoded_wav_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode: parse each RIFF/WAVE payload with
    :func:`decode_wav_pcm16` (rate and frame count come from the fmt /
    data chunks, never from the synthesizer) and reduce the PCM to
    exact-integer stats — Σamp, Σamp², peak, trough — numpy per batch,
    Arrow in/out."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "sum_amp",
                "sum_sq", "peak", "trough",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                rate, _, frames = decode_wav_pcm16(bytes(payload))
                s = frames.astype(np.int64).ravel()
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                out["sum_amp"].append(int(s.sum()) if len(s) else 0)
                out["sum_sq"].append(int((s * s).sum()) if len(s) else 0)
                out["peak"].append(int(s.max()) if len(s) else 0)
                out["trough"].append(int(s.min()) if len(s) else 0)
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_stats, WAV_STATS_SCHEMA)


def decoded_bmp_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode: parse each BMP payload with
    :func:`decode_bmp24` (dimensions come from the BITMAPINFOHEADER,
    row padding and bottom-up BGR order are undone by the parser) and
    reduce the RGB grid to exact-integer channel sums and extrema."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
                "max_px", "min_px",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                pix = decode_bmp24(bytes(payload)).astype(np.int64)
                out["doc_id"].append(doc_id)
                out["height"].append(pix.shape[0])
                out["width"].append(pix.shape[1])
                out["sum_r"].append(int(pix[:, :, 0].sum()))
                out["sum_g"].append(int(pix[:, :, 1].sum()))
                out["sum_b"].append(int(pix[:, :, 2].sum()))
                out["max_px"].append(int(pix.max()))
                out["min_px"].append(int(pix.min()))
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_stats, BMP_STATS_SCHEMA)


PNG_STATS_SCHEMA = (
    "doc_id long, width int, height int, sum_r long, sum_g long,"
    " sum_b long, max_px int, min_px int"
)

AUDIO_FRAME_SCHEMA = (
    "doc_id long, frame_id int, n int, sum_sq long, peak int,"
    " n_zero_cross int"
)


def synth_png_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG corpus: per id, a ``(3 + id % 4) ×
    (2 + id % 5)`` RGB image with channel values
    ``(id + 11·row + 17·col + 31·ch) % 256``, encoded as REAL
    zlib-compressed PNGs whose scanline filters cycle ``row % 5`` —
    every decode exercises None/Sub/Up/Average/Paeth.  The closed form
    lets the SQL oracle state the decoded stats byte-free."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                h, w = 3 + d % 4, 2 + d % 5
                r = np.arange(h).reshape(h, 1, 1)
                c = np.arange(w).reshape(1, w, 1)
                ch = np.arange(3).reshape(1, 1, 3)
                pix = ((d + 11 * r + 17 * c + 31 * ch) % 256).astype(
                    np.uint8
                )
                payloads.append(encode_png(pix))
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth, "doc_id long, payload binary"
    )


def decoded_png_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL compressed-image decode: inflate and unfilter each PNG with
    :func:`decode_png` (dims from IHDR, zlib IDAT, all five scanline
    filters undone) and reduce the RGB grid to exact-integer channel
    sums and extrema — any inflate/filter/channel bug hash-mismatches
    the closed-form oracle."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
                "max_px", "min_px",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                pix = decode_png(bytes(payload)).astype(np.int64)
                out["doc_id"].append(doc_id)
                out["height"].append(pix.shape[0])
                out["width"].append(pix.shape[1])
                out["sum_r"].append(int(pix[:, :, 0].sum()))
                out["sum_g"].append(int(pix[:, :, 1].sum()))
                out["sum_b"].append(int(pix[:, :, 2].sum()))
                out["max_px"].append(int(pix.max()))
                out["min_px"].append(int(pix.min()))
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_stats, PNG_STATS_SCHEMA)


def audio_frame_features(
    df: DataFrame, frame_len: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Framewise audio features over DECODED PCM — the feature-extract
    step after decode in any audio pipeline (librosa's frame/energy/zcr
    trio, reduced to exact integers): non-overlapping ``frame_len``
    windows (tail remainder dropped), per frame Σamp² (energy), peak,
    and the zero-crossing count (sign flips between adjacent samples,
    sign = amp ≥ 0).  All-integer outputs → full SQL oracle."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_id", "n", "sum_sq", "peak",
                "n_zero_cross",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                _, _, frames = decode_wav_pcm16(bytes(payload))
                s = frames.astype(np.int64).ravel()
                n_frames = len(s) // frame_len
                for f in range(n_frames):
                    seg = s[f * frame_len : (f + 1) * frame_len]
                    nonneg = seg >= 0
                    out["doc_id"].append(doc_id)
                    out["frame_id"].append(f)
                    out["n"].append(frame_len)
                    out["sum_sq"].append(int((seg * seg).sum()))
                    out["peak"].append(int(np.abs(seg).max()))
                    out["n_zero_cross"].append(
                        int((nonneg[1:] != nonneg[:-1]).sum())
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(
        _feats, AUDIO_FRAME_SCHEMA
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


# --------------------------------------------------------------------------
# AVI video container (RIFF): real header/index parsing, codec-free
# --------------------------------------------------------------------------
AVI_STATS_SCHEMA = (
    "doc_id long, n_frames int, us_per_frame int, width int, height int,"
    " total_bytes long, max_frame int, min_frame int"
)


def encode_avi_mjpeg(
    frame_payloads: list[bytes],
    us_per_frame: int = 33_333,
    width: int = 64,
    height: int = 48,
) -> bytes:
    """Serialize frame payloads as a canonical AVI container: RIFF
    'AVI ' with a hdrl LIST (avih MainAVIHeader + one 'vids'/'MJPG'
    stream: strh + strf BITMAPINFOHEADER), a movi LIST of '00dc'
    chunks, and a classic idx1 index — the real on-disk layout video
    tooling reads.  The frame payloads themselves are opaque (a real
    file would hold JPEG bytes; decoding THOSE needs a codec library —
    the container walk does not)."""
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(frame_payloads), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER convention: fps = dwRate / dwScale, so
    # dwScale = us_per_frame, dwRate = 1_000_000 (microsecond ticks)
    # reads as ~30 fps in real AVI tooling (round-9 advice: the
    # swapped order read as ~0.03 fps)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, us_per_frame, 1_000_000,
        0, len(frame_payloads), 0, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + ltype + body

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    idx = b""
    for p in frame_payloads:
        offset = len(movi_body)  # offset of the chunk within movi
        movi_body += chunk(b"00dc", p)
        idx += b"00dc" + struct.pack("<III", 0x10, offset, len(p))
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_meta(payload: bytes) -> dict:
    """Parse an AVI container without any codec: RIFF walk to the hdrl
    LIST (frame cadence + dims from MainAVIHeader), then the movi LIST
    ('00dc'/'01wb' chunk sizes = per-frame byte counts), cross-checked
    against the idx1 index when present (a corrupt or truncated index
    raises).  Returns {us_per_frame, width, height, n_frames,
    frame_sizes} — the container-level metadata a video-curation
    pipeline needs (fps stats, bitrate spikes, frame counts) before any
    expensive codec pass."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos, avih, sizes, idx_sizes = 12, None, [], None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data_start = pos + 8
        if cid == b"LIST":
            ltype = payload[data_start : data_start + 4]
            if ltype == b"hdrl":
                # avih is the first chunk inside hdrl
                p2 = data_start + 4
                cid2 = payload[p2 : p2 + 4]
                (s2,) = struct.unpack_from("<I", payload, p2 + 4)
                if cid2 == b"avih":
                    avih = payload[p2 + 8 : p2 + 8 + s2]
                # RIFF chunks (LIST included) pad to even sizes —
                # external encoders may emit odd LIST sizes
                pos = data_start + size + (size & 1)
                continue
            if ltype == b"movi":
                p2, end = data_start + 4, data_start + size
                while p2 + 8 <= end:
                    cid2 = payload[p2 : p2 + 4]
                    (s2,) = struct.unpack_from("<I", payload, p2 + 4)
                    if cid2[2:4] in (b"dc", b"wb", b"db"):
                        sizes.append(s2)
                    p2 += 8 + s2 + (s2 & 1)
                pos = data_start + size + (size & 1)
                continue
        elif cid == b"idx1":
            idx_sizes = [
                struct.unpack_from("<I", payload, data_start + 16 * k + 12)[0]
                for k in range(size // 16)
            ]
        pos = data_start + size + (size & 1)
    if avih is None:
        raise ValueError("AVI payload missing avih header")
    us_per_frame, _, _, _, total, _, _, _, w, h = struct.unpack_from(
        "<IIIIIIIIII", avih
    )
    if idx_sizes is not None and idx_sizes != sizes:
        raise ValueError("AVI idx1 index disagrees with movi chunks")
    if total != len(sizes):
        raise ValueError(
            f"AVI header declares {total} frames, movi carries {len(sizes)}"
        )
    return {
        "us_per_frame": us_per_frame,
        "width": w,
        "height": h,
        "n_frames": len(sizes),
        "frame_sizes": sizes,
    }


def synth_avi_corpus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic AVI corpus: per id, ``5 + id % 6`` frames of
    ``100 + (id·13 + i·7) % 50`` bytes at ``33333 + (id % 5)·1000`` µs
    cadence, dims (64, 48) — REAL AVI bytes via
    :func:`encode_avi_mjpeg` (hdrl + movi + idx1)."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                frames = [
                    bytes(
                        ((d * 13 + i * 7 + j) % 256)
                        for j in range(100 + (d * 13 + i * 7) % 50)
                    )
                    for i in range(5 + d % 6)
                ]
                payloads.append(
                    encode_avi_mjpeg(frames, 33_333 + (d % 5) * 1000)
                )
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth, "doc_id long, payload binary"
    )


def decoded_avi_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL video-container decode: parse each AVI with
    :func:`decode_avi_meta` (header cadence/dims, movi chunk walk,
    idx1 cross-check) and reduce the frame-size stream to exact
    integers — the bitrate/cadence profile of a video curation pass."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_frames", "us_per_frame", "width", "height",
                "total_bytes", "max_frame", "min_frame",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                m = decode_avi_meta(bytes(payload))
                out["doc_id"].append(doc_id)
                out["n_frames"].append(m["n_frames"])
                out["us_per_frame"].append(m["us_per_frame"])
                out["width"].append(m["width"])
                out["height"].append(m["height"])
                out["total_bytes"].append(int(sum(m["frame_sizes"])))
                out["max_frame"].append(int(max(m["frame_sizes"])))
                out["min_frame"].append(int(min(m["frame_sizes"])))
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(_stats, AVI_STATS_SCHEMA)
