"""Real multimodal container codecs (round-9: the decode stub is gone).

Pure-numpy RIFF/WAVE-PCM16 and 24-bit-BMP parsers: round trips, honest
header-driven parsing (chunk walk past foreign chunks, dimensions from
BITMAPINFOHEADER), row-padding handling, and the rejection paths for
genuinely codec-requiring formats.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stream_processing_with_flink_study_spark.functions import multimodal as M


def _pix(d: int, h: int, w: int) -> np.ndarray:
    r = np.arange(h).reshape(h, 1, 1)
    c = np.arange(w).reshape(1, w, 1)
    ch = np.arange(3).reshape(1, 1, 3)
    return ((d + 7 * r + 13 * c + 29 * ch) % 256).astype(np.uint8)


def test_wav_round_trip_and_header_fields():
    amp = ((np.arange(73, dtype=np.int64) * 251 + 5 * 37) % 4001) - 2000
    rate, n_ch, frames = M.decode_wav_pcm16(M.encode_wav_pcm16(amp, 11000))
    assert (rate, n_ch) == (11000, 1)
    assert (frames.ravel() == amp).all()


def test_wav_chunk_walk_skips_foreign_chunks():
    """Real WAVE files carry LIST/INFO (often odd-sized, word-padded)
    chunks between fmt and data; the parser must walk, not assume fixed
    offsets."""
    amp = np.arange(-20, 20, dtype=np.int64)
    b = M.encode_wav_pcm16(amp, 8000)
    pos = b.index(b"data")
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = b[:pos] + foreign + b[pos:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, _, frames = M.decode_wav_pcm16(patched)
    assert rate == 8000 and (frames.ravel() == amp).all()


def test_wav_rejects_non_pcm_and_non_riff():
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav_pcm16(b"\x89PNG" + b"\x00" * 60)
    b = bytearray(M.encode_wav_pcm16(np.zeros(4, dtype=np.int64), 8000))
    fmt_at = bytes(b).index(b"fmt ") + 8
    struct.pack_into("<H", b, fmt_at, 85)  # format tag 85 = MP3
    with pytest.raises(ValueError, match="PCM"):
        M.decode_wav_pcm16(bytes(b))


@pytest.mark.parametrize("d", range(8))
def test_bmp_round_trip_all_stride_paddings(d):
    """Widths 3..7 cover every row-padding residue (w*3 mod 4)."""
    h, w = 2 + d % 3, 3 + d % 5
    pix = _pix(d, h, w)
    back = M.decode_bmp24(M.encode_bmp24(pix))
    assert back.shape == (h, w, 3)
    assert (back == pix).all()


def test_bmp_dimensions_come_from_header_not_caller():
    pix = _pix(3, 4, 7)
    b = M.encode_bmp24(pix)
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    assert (hdr_size, w, h) == (40, 7, 4)
    assert M.decode_bmp24(b).shape == (4, 7, 3)


def test_bmp_rejects_compressed_or_paletted():
    b = bytearray(M.encode_bmp24(_pix(0, 2, 3)))
    struct.pack_into("<H", b, 14 + 14, 8)  # bpp = 8 (paletted)
    with pytest.raises(ValueError, match="24-bit"):
        M.decode_bmp24(bytes(b))


def test_dispatch_by_magic_bytes():
    wav = M.encode_wav_pcm16(np.arange(5, dtype=np.int64), 9000)
    bmp = M.encode_bmp24(_pix(1, 2, 3))
    assert M.decode_payload(wav)[0] == 9000
    assert M.decode_payload(bmp).shape == (2, 3, 3)
    with pytest.raises(ValueError, match="unsupported container"):
        M.decode_payload(b"\xff\xd8\xff\xe0JFIF")  # JPEG needs a codec


def test_decoded_stats_stages_match_closed_form(spark):
    """The Spark encode→decode pipeline over a small id range matches
    the synthesis closed form computed directly — the same law the
    DuckDB oracles of wav_pcm_stats / bmp_pixel_stats check at scale."""
    ids = spark.range(7).withColumnRenamed("id", "doc_id")
    wav_rows = {
        r["doc_id"]: r
        for r in M.decoded_wav_stats(M.synth_wav_corpus(ids)).collect()
    }
    for d in range(7):
        n = 50 + d % 50
        amp = (d * 37 + np.arange(n, dtype=np.int64) * 251) % 4001 - 2000
        r = wav_rows[d]
        assert r["sample_rate"] == 8000 + (d % 8) * 1000
        assert r["n_samples"] == n
        assert r["sum_amp"] == int(amp.sum())
        assert r["sum_sq"] == int((amp * amp).sum())
        assert (r["peak"], r["trough"]) == (int(amp.max()), int(amp.min()))
    bmp_rows = {
        r["doc_id"]: r
        for r in M.decoded_bmp_stats(M.synth_bmp_corpus(ids)).collect()
    }
    for d in range(7):
        pix = _pix(d, 2 + d % 3, 3 + d % 5).astype(np.int64)
        r = bmp_rows[d]
        assert (r["height"], r["width"]) == pix.shape[:2]
        assert r["sum_r"] == int(pix[:, :, 0].sum())
        assert r["sum_b"] == int(pix[:, :, 2].sum())
        assert (r["max_px"], r["min_px"]) == (int(pix.max()), int(pix.min()))


# --------------------------------------------------------------------------
# PNG (zlib-compressed container, all five scanline filters)
# --------------------------------------------------------------------------
def test_png_round_trip_every_filter_type():
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 3), (5, 4), (9, 7)]:
        pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ft in range(5):
            got = M.decode_png(M.encode_png(pix, row_filter=lambda r: ft))
            assert (got == pix).all(), f"filter {ft} at {h}x{w}"
        # the default cycling filter hits all five on tall images
        assert (M.decode_png(M.encode_png(pix)) == pix).all()


def test_png_chunk_walk_skips_ancillary_and_joins_split_idat():
    import zlib as _zlib

    pix = _pix(3, 4, 5)
    payload = M.encode_png(pix, row_filter=lambda r: 0)
    # rebuild: signature + IHDR + tEXt (ancillary) + IDAT split in two
    sig = payload[:8]
    (ihdr_len,) = struct.unpack_from(">I", payload, 8)
    ihdr_chunk = payload[8 : 8 + 12 + ihdr_len]
    raw = bytearray()
    for r in range(4):
        raw.append(0)
        raw.extend(pix[r].reshape(-1).tobytes())
    comp = _zlib.compress(bytes(raw))
    half = len(comp) // 2
    rebuilt = (
        sig
        + ihdr_chunk
        + M._png_chunk(b"tEXt", b"Comment\x00synthetic")
        + M._png_chunk(b"IDAT", comp[:half])
        + M._png_chunk(b"IDAT", comp[half:])
        + M._png_chunk(b"IEND", b"")
    )
    assert (M.decode_png(rebuilt) == pix).all()


def test_png_rejects_unsupported_shapes():
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png(b"\x89PNX" + b"\x00" * 20)
    # 16-bit depth IHDR must raise, naming the plug-in point
    pix = _pix(1, 2, 2)
    payload = bytearray(M.encode_png(pix))
    payload[8 + 8 + 8] = 16  # IHDR bit-depth byte
    # fix the CRC so the parser reaches the depth check honestly
    import zlib as _zlib

    ihdr = bytes(payload[8 + 8 : 8 + 8 + 4 + 13])[4:]  # type+data
    crc = _zlib.crc32(b"IHDR" + ihdr[:13].rjust(13, b"\x00"))
    with pytest.raises(ValueError, match="PIL"):
        M.decode_png(bytes(payload))


def test_png_paeth_predictor_reference():
    # RFC 2083 tie rules: prefer a, then b, then c
    assert M._paeth(0, 0, 0) == 0
    assert M._paeth(5, 5, 5) == 5  # ties -> a
    assert M._paeth(10, 20, 15) == 15  # p=15, pc=0 wins -> c
    assert M._paeth(10, 20, 14) == 14  # p=16, pa=6 pb=4 pc=2 -> c
    assert M._paeth(1, 9, 2) == 9  # p=8, pa=7 pb=1 pc=6 -> b
    assert M._paeth(9, 1, 2) == 9  # p=8, pa=1 -> a


def test_decode_payload_dispatches_png():
    pix = _pix(4, 3, 3)
    got = M.decode_payload(M.encode_png(pix))
    assert (got == pix).all()


def test_audio_frame_features_match_numpy(spark):
    ids = spark.range(5).withColumnRenamed("id", "doc_id")
    rows = M.audio_frame_features(M.synth_wav_corpus(ids)).collect()
    got = {(r["doc_id"], r["frame_id"]): r for r in rows}
    for d in range(5):
        n = 50 + d % 50
        amp = (d * 37 + np.arange(n, dtype=np.int64) * 251) % 4001 - 2000
        n_frames = n // 16
        for f in range(n_frames):
            seg = amp[f * 16 : (f + 1) * 16]
            nonneg = seg >= 0
            r = got[(d, f)]
            assert r["sum_sq"] == int((seg * seg).sum())
            assert r["peak"] == int(np.abs(seg).max())
            assert r["n_zero_cross"] == int(
                (nonneg[1:] != nonneg[:-1]).sum()
            )
        assert (d, n_frames) not in got  # tail remainder dropped


# --------------------------------------------------------------------------
# AVI (video container: header + movi walk + idx1 cross-check)
# --------------------------------------------------------------------------
def test_avi_round_trip_and_header_fields():
    frames = [bytes((i * 3 + j) % 256 for j in range(90 + i)) for i in range(7)]
    m = M.decode_avi_meta(M.encode_avi_mjpeg(frames, 25_000, 320, 240))
    assert m["n_frames"] == 7
    assert m["us_per_frame"] == 25_000
    assert (m["width"], m["height"]) == (320, 240)
    assert m["frame_sizes"] == [len(f) for f in frames]


def test_avi_strh_fps_convention():
    # AVISTREAMHEADER: fps = dwRate / dwScale.  Parse strh out of the
    # raw bytes and assert a 25_000 us cadence reads as 40 fps in real
    # AVI tooling (round-9 advice: the swapped packing read ~0.03 fps).
    import struct

    payload = M.encode_avi_mjpeg([b"a" * 100], 25_000, 64, 48)
    at = payload.index(b"strh")
    strh = payload[at + 8 : at + 8 + struct.unpack_from("<I", payload, at + 4)[0]]
    dw_scale, dw_rate = struct.unpack_from("<II", strh, 20)
    assert dw_scale == 25_000 and dw_rate == 1_000_000
    assert abs(dw_rate / dw_scale - 40.0) < 1e-9


def test_avi_odd_sized_frames_word_aligned():
    # odd chunk sizes force the RIFF pad byte; the walk must skip it
    frames = [b"x" * 99, b"y" * 101, b"z" * 97]
    m = M.decode_avi_meta(M.encode_avi_mjpeg(frames))
    assert m["frame_sizes"] == [99, 101, 97]


def test_avi_index_disagreement_raises():
    import struct as _s

    payload = bytearray(M.encode_avi_mjpeg([b"a" * 100, b"b" * 100]))
    # corrupt the last idx1 entry's size field
    idx_at = bytes(payload).rfind(b"idx1")
    _s.pack_into("<I", payload, idx_at + 8 + 16 + 12, 999)
    with pytest.raises(ValueError, match="idx1"):
        M.decode_avi_meta(bytes(payload))


def test_avi_frame_count_mismatch_raises():
    import struct as _s

    payload = bytearray(M.encode_avi_mjpeg([b"a" * 100, b"b" * 100]))
    hdr_at = bytes(payload).find(b"avih")
    _s.pack_into("<I", payload, hdr_at + 8 + 16, 5)  # dwTotalFrames
    with pytest.raises(ValueError, match="frames"):
        M.decode_avi_meta(bytes(payload))


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="AVI"):
        M.decode_avi_meta(b"RIFF\x00\x00\x00\x00WAVE")
