"""The real PNG codec: hand-assembled fixtures (not just the module's own
encoder output) covering every filter type, grayscale, multi-IDAT split,
CRC verification, and fuzzed corruption — malformed input must flip
png_ok, never crash."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

from zio_kinesis_example_spark.operators.multimodal_png import (
    _chunk, _PNG_SIG, png_decode_batch, png_encode_batch,
)


def _decode(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return pd.concat(png_decode_batch(iter([pdf]))).reset_index(drop=True)


def _png(w: int, h: int, ctype: int, scanlines: bytes,
         idat_split: int | None = None) -> bytes:
    """Assemble a PNG by hand from pre-filtered scanline bytes."""
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    z = zlib.compress(scanlines)
    if idat_split:
        idats = b"".join(_chunk(b"IDAT", z[o:o + idat_split])
                         for o in range(0, len(z), idat_split))
    else:
        idats = _chunk(b"IDAT", z)
    return _PNG_SIG + ihdr + idats + _chunk(b"IEND", b"")


def test_decode_filter_none_rgb():
    pix = bytes([10, 20, 30, 40, 50, 60])
    r = _decode([_png(2, 1, 2, b"\x00" + pix)]).iloc[0]
    assert bool(r.png_ok)
    assert (r.width, r.height, r.bit_depth, r.color_type) == (2, 1, 8, 2)
    assert r.row0_sum == r.pixel_sum == sum(pix)


def test_decode_filter_sub():
    # raw = [10,20,30, 15,25,35] → Sub deltas [10,20,30, 5,5,5]
    r = _decode([_png(2, 1, 2, bytes([1, 10, 20, 30, 5, 5, 5]))]).iloc[0]
    assert bool(r.png_ok)
    assert r.pixel_sum == 10 + 20 + 30 + 15 + 25 + 35


def test_decode_filter_up_and_average():
    # row0 (None): [4,6,8]; row1 (Up): raw = up + filt = [5,8,11]
    # row2 (Average, 1 px): pred = (left=0? no: left per pixel) —
    # first pixel: pred = (0 + up) >> 1 = [2,4,5]; raw = filt + pred
    lines = (b"\x00" + bytes([4, 6, 8])
             + b"\x02" + bytes([1, 2, 3])
             + b"\x03" + bytes([1, 1, 1]))
    r = _decode([_png(1, 3, 2, lines)]).iloc[0]
    assert bool(r.png_ok)
    assert r.row0_sum == 18
    # row1 = [5,8,11]; row2 = filt + ((0 + up)>>1) = [1+2, 1+4, 1+5]
    assert r.pixel_sum == 18 + 24 + (3 + 5 + 6)


def test_decode_filter_paeth_matches_reference_unfilter():
    # 2x2 RGB, all four rows Paeth-filtered from a known raw plane;
    # verify against an independent scalar unfilter implementation.
    raw = np.array([[1, 2, 3, 4, 5, 6], [7, 8, 9, 10, 11, 12]],
                   dtype=np.int64)
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)
    lines = b""
    prev = np.zeros(6, dtype=np.int64)
    for r_ in range(2):
        lines += b"\x04"
        for x in range(6):
            left = raw[r_, x - 3] if x >= 3 else 0
            upleft = prev[x - 3] if x >= 3 else 0
            lines += bytes([(raw[r_, x] - paeth(left, prev[x], upleft))
                            % 256])
        prev = raw[r_]
    r = _decode([_png(2, 2, 2, lines)]).iloc[0]
    assert bool(r.png_ok)
    assert r.row0_sum == raw[0].sum()
    assert r.pixel_sum == raw.sum()


def test_decode_grayscale_and_multi_idat():
    pix = bytes(range(1, 9))  # 8x1 gray, filter None
    blob = _png(8, 1, 0, b"\x00" + pix, idat_split=3)
    r = _decode([blob]).iloc[0]
    assert bool(r.png_ok) and r.color_type == 0
    assert r.pixel_sum == sum(pix)
    assert blob.count(b"IDAT") >= 2  # split really happened


def test_decode_rejects_corruption_without_crashing():
    good = _png(2, 1, 2, b"\x00" + bytes(6))
    flipped_crc = good[:-5] + bytes([good[-5] ^ 0xFF]) + good[-4:]
    short_idat = _png(2, 2, 2, b"\x00" + bytes(6))  # stream too short
    bad = [b"", b"\x89PNG", good[:20], flipped_crc, short_idat,
           b"\x00" * 64, good.replace(b"IEND", b"XXXX")]
    out = _decode(bad + [good])
    assert list(out.png_ok) == [False] * len(bad) + [True]
    assert (out.pixel_sum[:len(bad)] == 0).all()


def test_decode_rejects_unsupported_layouts():
    # 16-bit depth, palette color, interlaced: all structurally valid
    # CRC-wise but outside the supported layout
    for depth, ctype, inter in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
        ihdr = _chunk(b"IHDR",
                      struct.pack(">IIBBBBB", 1, 1, depth, ctype, 0, 0, inter))
        blob = (_PNG_SIG + ihdr
                + _chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
                + _chunk(b"IEND", b""))
        assert not _decode([blob]).png_ok.iloc[0]


def test_encode_decode_round_trip_batch():
    texts = [b"hello png world", b"a", b"", b"xyz" * 50]
    pdf = pd.DataFrame({"doc_id": list(range(len(texts))),
                        "payload": texts})
    encoded = pd.concat(png_encode_batch(iter([pdf])))
    out = pd.concat(png_decode_batch(iter([encoded]))).reset_index(drop=True)
    assert out.png_ok.all()
    dims = {0: (13, 5), 1: (21, 8), 2: (29, 11)}
    for i, text in enumerate(texts):
        w, h = dims[i % 3]
        n = w * 3 * h
        want = (sum(text[k % len(text)] for k in range(n)) if text else 0)
        row = out.iloc[i]
        assert (row.width, row.height) == (w, h)
        assert row.pixel_sum == want, i


def test_encoder_exercises_all_five_filters():
    # heights are 5, 8, 11 → every class emits filter types 0..4
    pdf = pd.DataFrame({"doc_id": [2], "payload": [b"filter coverage"]})
    blob = bytes(pd.concat(png_encode_batch(iter([pdf]))).payload.iloc[0])
    # find the IDAT stream, inflate, check the per-row filter bytes
    z, off = b"", 8
    while off + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, off)
        ctype = blob[off + 4:off + 8]
        if ctype == b"IDAT":
            z += blob[off + 8:off + 8 + length]
        off += 12 + length
    lines = zlib.decompress(z)
    rb = 29 * 3
    fts = [lines[r * (1 + rb)] for r in range(11)]
    assert fts == [r % 5 for r in range(11)]
    assert blob.count(b"IDAT") >= 2  # multi-IDAT on the real path


def test_decode_fuzz_random_bytes_never_crash():
    rng = np.random.RandomState(7)
    payloads = [rng.bytes(rng.randint(0, 200)) for _ in range(200)]
    # prefix half with the real signature so the chunk walker runs
    payloads = [(_PNG_SIG + p if i % 2 else p)
                for i, p in enumerate(payloads)]
    out = _decode(payloads)
    assert not out.png_ok.any()


def test_decode_fuzz_truncations_of_valid_file():
    good = _png(3, 2, 2, b"\x00" + bytes(9) + b"\x02" + bytes(9))
    outs = _decode([good[:n] for n in range(0, len(good), 7)] + [good])
    assert not outs.png_ok.iloc[:-1].any()
    assert bool(outs.png_ok.iloc[-1])
