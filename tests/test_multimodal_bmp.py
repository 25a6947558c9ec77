"""The real BMP codec: decode hand-written fixtures (not just the
module's own encoder output), round-trip the encoder, reject garbage."""

from __future__ import annotations

import struct

import pandas as pd

from zio_kinesis_example_spark.operators.multimodal import (
    _BMP_PAD, bmp_decode_batch, bmp_encode_batch,
)


def _bmp(width: int, height: int, rows: list[bytes], pad: int = 0x00) -> bytes:
    """Hand-assemble an uncompressed 24-bit BMP. ``rows`` are the STORED
    rows (caller controls orientation via the sign of ``height``)."""
    row_bytes = width * 3
    stride = (row_bytes + 3) // 4 * 4
    hdr = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + stride * abs(height), 0, 0, 54,
        40, width, height, 1, 24, 0, stride * abs(height), 2835, 2835, 0, 0,
    )
    body = b"".join(r + bytes([pad]) * (stride - row_bytes) for r in rows)
    return hdr + body


def _decode(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return pd.concat(bmp_decode_batch(iter([pdf]))).reset_index(drop=True)


def test_decode_handwritten_bottom_up():
    # 2x2, bottom-up: stored row 0 is IMAGE row 1. stride 8 (2 pad bytes).
    img_row0 = bytes([1, 2, 3, 4, 5, 6])        # image top row
    img_row1 = bytes([7, 8, 9, 10, 11, 12])
    payload = _bmp(2, 2, [img_row1, img_row0], pad=0xFF)
    out = _decode([payload])
    r = out.iloc[0]
    assert bool(r.bmp_ok)
    assert (r.width, r.height, r.bpp) == (2, 2, 24)
    assert r.row0_sum == sum(img_row0)          # orientation decoded
    assert r.pixel_sum == sum(img_row0) + sum(img_row1)  # pads skipped


def test_decode_handwritten_top_down():
    # negative height = top-down: stored row 0 IS image row 0
    img_row0 = bytes([9, 9, 9, 1, 1, 1])
    img_row1 = bytes([2, 2, 2, 2, 2, 2])
    payload = _bmp(2, -2, [img_row0, img_row1], pad=0xFF)
    r = _decode([payload]).iloc[0]
    assert bool(r.bmp_ok) and r.height == 2
    assert r.row0_sum == sum(img_row0)
    assert r.pixel_sum == sum(img_row0) + sum(img_row1)


def test_decode_rejects_garbage_without_crashing():
    good = _bmp(1, 1, [bytes([10, 20, 30])])
    out = _decode([
        b"",                      # empty
        b"BM",                    # truncated header
        b"PNG" + b"\x00" * 60,    # wrong magic
        good[:57],                # truncated pixel array
        good,                     # valid, mixed into the same batch
    ])
    assert list(out.bmp_ok) == [False, False, False, False, True]
    assert out.iloc[4].pixel_sum == 60


def test_decode_valid_file_followed_by_garbage():
    # regression: reduceat segment clamping used to truncate the LAST
    # doc-with-rows' pixel_sum when a zero-row payload followed it
    good = _bmp(2, 2, [bytes([1, 2, 3, 4, 5, 6]), bytes([7, 8, 9, 10, 11, 12])])
    out = _decode([good, b"", good[:30]])
    assert list(out.bmp_ok) == [True, False, False]
    assert out.iloc[0].pixel_sum == sum(range(1, 13))


def test_decode_batch_of_only_tiny_payloads():
    # regression: a batch whose flat buffer is shorter than one header
    # must not crash the fixed-offset header gathers
    out = _decode([b"", b"BM", b"x"])
    assert list(out.bmp_ok) == [False, False, False]


def test_encode_decode_round_trip_batch():
    texts = [b"hello world", b"x", b"abcdefghijklmnopqrstuvwxyz0123"]
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "payload": texts})
    encoded = pd.concat(bmp_encode_batch(iter([pdf]))).reset_index(drop=True)
    out = _decode(list(encoded.payload))
    dims = {0: (15, 6), 1: (22, 9), 2: (33, 12)}
    for i, t in enumerate(texts):
        r = out.iloc[i]
        w, h = dims[i]
        assert bool(r.bmp_ok) and (r.width, r.height) == (w, h)
        n = w * h * 3
        want = sum(t[k % len(t)] for k in range(n))
        assert r.pixel_sum == want
        assert r.row0_sum == sum(t[k % len(t)] for k in range(w * 3))


def test_encoder_emits_genuine_bmp_bytes():
    pdf = pd.DataFrame({"doc_id": [0], "payload": [b"spark"]})
    enc = pd.concat(bmp_encode_batch(iter([pdf]))).iloc[0].payload
    assert enc[:2] == b"BM"
    size, = struct.unpack_from("<I", enc, 2)
    assert size == len(enc) == 54 + 48 * 6      # class 0: 15x6, stride 48
    off, = struct.unpack_from("<I", enc, 10)
    assert off == 54
    w, h = struct.unpack_from("<ii", enc, 18)
    assert (w, h) == (15, 6)
    # pad bytes present at end of each stored row
    assert enc[54 + 45] == _BMP_PAD
