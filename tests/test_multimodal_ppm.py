"""The real PPM (P6) codec: decode hand-written fixtures (not just the
module's own encoder output) — whitespace runs, CRLF, comments in every
legal position — and reject garbage without crashing."""

from __future__ import annotations

import pandas as pd

from zio_kinesis_example_spark.operators.multimodal import (
    ppm_decode_batch, ppm_encode_batch,
)


def _decode(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return pd.concat(ppm_decode_batch(iter([pdf]))).reset_index(drop=True)


def test_decode_handwritten_minimal():
    # 2x1 image, canonical single-space header
    pix = bytes([10, 20, 30, 40, 50, 60])
    r = _decode([b"P6\n2 1\n255\n" + pix]).iloc[0]
    assert bool(r.ppm_ok)
    assert (r.width, r.height, r.maxval) == (2, 1, 255)
    assert r.header_len == 11
    assert r.row0_sum == r.pixel_sum == sum(pix)


def test_decode_whitespace_runs_and_crlf():
    # arbitrary whitespace runs between tokens are legal, including CRLF
    pix = bytes([1, 2, 3])
    r = _decode([b"P6\r\n  1\t\t1 \r\n 255 " + pix]).iloc[0]
    assert bool(r.ppm_ok)
    assert (r.width, r.height, r.maxval) == (1, 1, 255)
    assert r.pixel_sum == 6


def test_decode_comments_everywhere():
    # '#'-to-newline comments wherever whitespace is legal — including a
    # comment containing digits, which must NOT leak into a token
    pix = bytes([5, 6, 7, 8, 9, 10])
    hdr = b"P6\n# made by 99 elves\n2\n# h next\n1 # inline\n255\n"
    r = _decode([hdr + pix]).iloc[0]
    assert bool(r.ppm_ok)
    assert (r.width, r.height, r.maxval) == (2, 1, 255)
    assert r.header_len == len(hdr)
    assert r.pixel_sum == sum(pix)


def test_decode_non_255_maxval_and_row0():
    # maxval 15 is legal (single-byte samples); row0 = first w*3 bytes
    row0 = bytes([1, 1, 1, 2, 2, 2])
    row1 = bytes([3, 3, 3, 4, 4, 4])
    r = _decode([b"P6 2 2 15 " + row0 + row1]).iloc[0]
    assert bool(r.ppm_ok) and r.maxval == 15
    assert r.row0_sum == sum(row0)
    assert r.pixel_sum == sum(row0) + sum(row1)


def test_decode_rejects_garbage_without_crashing():
    good = b"P6\n1 1\n255\n" + bytes([7, 8, 9])
    out = _decode([
        b"",                          # empty
        b"P6",                        # magic only
        b"P5\n1 1\n255\n\x00",        # P5 is not P6
        b"P6\n1 1\n70000\n" + b"\x00" * 3,   # maxval out of byte range
        b"P6\n1 x\n255\n\x00\x00\x00",       # non-numeric token
        b"P6\n12#\n1\n255\n" + b"\x00" * 36,  # '#' inside a number
        good[:-1],                    # truncated pixel plane
        good,                         # valid, mixed into the same batch
    ])
    assert list(out.ppm_ok) == [False] * 7 + [True]
    assert out.iloc[7].pixel_sum == 24


def test_decode_batch_of_only_tiny_payloads():
    out = _decode([b"", b"P6", b"x"])
    assert list(out.ppm_ok) == [False, False, False]


def test_decode_rejects_int64_wrapping_dimension_token():
    """A 20-digit width token wraps int64 to a small value (2^64+10 ≡ 10)
    — the tokenizer must reject it long before the wrap instead of
    accepting a mis-parsed geometry as ppm_ok (code-review r5 finding)."""
    wrapped = str(2**64 + 10).encode()        # ≡ 10 mod 2^64
    payload = b"P6\n" + wrapped + b" 1\n255\n" + b"\x00" * 30
    out = _decode([payload])
    assert not bool(out.iloc[0].ppm_ok)
    # a legitimately large-but-legal token still parses
    ok = _decode([b"P6\n10 1\n255\n" + b"\x00" * 30])
    assert bool(ok.iloc[0].ppm_ok) and ok.iloc[0].width == 10


def test_encode_decode_round_trip_batch():
    texts = [b"hello world", b"x", b"abcdefghijklmnopqrstuvwxyz0123"]
    pdf = pd.DataFrame({"doc_id": [0, 1, 2], "payload": texts})
    encoded = pd.concat(ppm_encode_batch(iter([pdf]))).reset_index(drop=True)
    out = _decode(list(encoded.payload))
    dims = {0: (17, 7), 1: (24, 10), 2: (31, 13)}
    for i, t in enumerate(texts):
        r = out.iloc[i]
        w, h = dims[i]
        assert bool(r.ppm_ok) and (r.width, r.height) == (w, h)
        n = w * h * 3
        assert r.pixel_sum == sum(t[k % len(t)] for k in range(n))
        assert r.row0_sum == sum(t[k % len(t)] for k in range(w * 3))


def test_encoder_emits_genuine_ppm_bytes():
    # class 2 (doc_id % 3 == 2) embeds a header comment — assert the raw
    # bytes really carry it, and that the plane starts right after
    pdf = pd.DataFrame({"doc_id": [2], "payload": [b"spark"]})
    enc = pd.concat(ppm_encode_batch(iter([pdf]))).iloc[0].payload
    hdr = b"P6\n# x\n31 13\n255\n"
    assert enc[: len(hdr)] == hdr
    assert len(enc) == len(hdr) + 31 * 13 * 3
    t = b"spark"
    assert enc[len(hdr):len(hdr) + 5] == bytes(
        t[k % len(t)] for k in range(5))


def test_encoders_zero_fill_empty_payloads():
    """An empty payload has no bytes to cycle: all three encoders must
    emit zero-filled planes for it, never bytes aliased from the NEXT
    document in the flat batch buffer (the int-mod-by-zero hazard)."""
    import warnings

    from zio_kinesis_example_spark.operators.multimodal import (
        bmp_decode_batch, bmp_encode_batch)
    from zio_kinesis_example_spark.operators.pipeline_ext import (
        wav_encode_batch)

    pdf = pd.DataFrame({"doc_id": [0, 1], "payload": [b"", b"\xff" * 9]})
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # mod-by-zero would warn
        ppm = pd.concat(ppm_encode_batch(iter([pdf.copy()])))
        bmp = pd.concat(bmp_encode_batch(iter([pdf.copy()])))
        wav = pd.concat(wav_encode_batch(iter([pdf.copy()])))
    # PPM class 0: header then plane — all zero for the empty doc
    hdr_len = 12
    assert set(ppm.iloc[0].payload[hdr_len:]) == {0}
    assert 0xFF in set(ppm.iloc[1].payload[13:])
    # BMP: pixel area zero except 0xAB stride pads
    dec = pd.concat(bmp_decode_batch(iter([pd.DataFrame({
        "doc_id": [0], "payload": [bmp.iloc[0].payload]})])))
    assert bool(dec.iloc[0].bmp_ok) and dec.iloc[0].pixel_sum == 0
    # WAV: PCM section zero (after the 53-byte fixed head)
    assert set(wav.iloc[0].payload[-10:]) == {0}
