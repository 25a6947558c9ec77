"""The real GIF/LZW codec: fixtures compressed by an INDEPENDENT
reference LZW compressor (dictionary growth, width bumps, KwKwK),
palette indirection, interlace, extensions, and fuzzed corruption."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from zio_kinesis_example_spark.operators.multimodal_gif import (
    _GRAY_PALETTE, _lzw_decode, _lzw_store, _sub_blocks, gif_decode_batch,
    gif_encode_batch,
)


def _decode(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return pd.concat(gif_decode_batch(iter([pdf]))).reset_index(drop=True)


def _lzw_compress_ref(indexes: bytes, min_code_size: int) -> bytes:
    """Independent REAL LZW compressor (textbook greedy longest-match,
    written fresh here so the decoder is not checked against its own
    twin): emits clear, dictionary-compressed codes with width bumps at
    the same thresholds a decoder grows at, and EOI."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indexes:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(w: int, h: int, indexes: bytes, palette: bytes = _GRAY_PALETTE,
         lzw: bytes | None = None, interlace: bool = False,
         extension: bool = False, mcs: int | None = None) -> bytes:
    size_field = max((len(palette) // 3).bit_length() - 2, 0)
    head = (b"GIF89a"
            + struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0) + palette)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00" if extension else b""
    ipack = 0x40 if interlace else 0x00
    imgd = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipack)
    if mcs is None:
        mcs = max((len(palette) // 3 - 1).bit_length(), 2)
    body = _sub_blocks(lzw if lzw is not None
                       else _lzw_compress_ref(indexes, mcs))
    return head + ext + imgd + bytes([mcs]) + body + b"\x3B"


def test_decode_store_mode_minimal():
    idx = bytes([3, 1, 4, 1, 5, 9])
    r = _decode([_gif(3, 2, idx, lzw=_lzw_store(idx))]).iloc[0]
    assert bool(r.gif_ok)
    assert (r.width, r.height) == (3, 2)
    assert r.index_sum == r.pixel_red_sum == sum(idx)
    assert r.row0_red_sum == 3 + 1 + 4


def test_decode_real_lzw_with_dictionary_growth():
    # 40x20 repetitive image: the reference compressor builds a real
    # dictionary and crosses the 9->10 bit width boundary
    idx = bytes((i * 7 + j) % 251 for i in range(20) for j in range(40))
    blob = _gif(40, 20, idx)
    assert len(blob) < len(_gif(40, 20, idx, lzw=_lzw_store(idx)))
    r = _decode([blob]).iloc[0]
    assert bool(r.gif_ok)
    assert r.index_sum == sum(idx)
    assert r.row0_red_sum == sum(idx[:40])


def test_decode_kwkwk_case():
    # aaaa... forces the cScSc (KwKwK) special case immediately
    idx = bytes([7]) * 100
    r = _decode([_gif(10, 10, idx)]).iloc[0]
    assert bool(r.gif_ok)
    assert r.index_sum == 700


def test_decode_applies_palette_not_just_indexes():
    # non-grayscale palette: red channel = 2*i, so pixel_red_sum differs
    # from index_sum — a decoder skipping the color table fails here
    pal = bytes(v for i in range(256) for v in ((2 * i) % 256, 0, 255))
    idx = bytes([1, 2, 3, 4])
    r = _decode([_gif(2, 2, idx, palette=pal)]).iloc[0]
    assert bool(r.gif_ok)
    assert r.index_sum == 10
    assert r.pixel_red_sum == 20


def test_decode_local_palette_and_extension_skip():
    pal = bytes(v for i in range(4) for v in (i * 10, 0, 0))
    idx = bytes([0, 1, 2, 3])
    # global grayscale table present, but a LOCAL 4-entry table wins
    size_field = 0  # 2 entries... build manually for the local case
    head = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0xF7, 0, 0) + _GRAY_PALETTE
    ext = b"\x21\xfe\x05hello\x00"  # comment extension, must be skipped
    imgd = struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0x81)  # local, size 1
    body = _sub_blocks(_lzw_compress_ref(idx, 2))
    r = _decode([head + ext + imgd + pal + b"\x02" + body + b"\x3B"]).iloc[0]
    assert bool(r.gif_ok)
    assert r.pixel_red_sum == 0 + 10 + 20 + 30


def test_decode_interlaced_rows_reordered():
    # 1x8 column image, interlaced: stored pass order is rows
    # 0,8.. -> 4 -> 2,6 -> 1,3,5,7; row0 must still be the true row 0
    truth = bytes([10, 11, 12, 13, 14, 15, 16, 17])
    stored = bytes([truth[r] for r in (0, 4, 2, 6, 1, 3, 5, 7)])
    r = _decode([_gif(1, 8, stored, interlace=True)]).iloc[0]
    assert bool(r.gif_ok)
    assert r.row0_red_sum == 10
    assert r.index_sum == sum(truth)


def test_decode_rejects_corruption_without_crashing():
    idx = bytes(range(16))
    good = _gif(4, 4, idx)
    imgd_at = 6 + 7 + 768  # sig + LSD + global palette
    assert good[imgd_at] == 0x2C
    bad = [b"", b"GIF87a", good[:30], good[:-2],
           good[:imgd_at] + b"\x99" + good[imgd_at + 1:],  # unknown block
           b"\xff" * 64]
    out = _decode(bad + [good])
    assert list(out.gif_ok) == [False] * len(bad) + [True]


def test_decode_rejects_truncated_lzw_and_oob_index():
    # stream ends before EOI
    idx = bytes([1, 2, 3, 4])
    full = _lzw_store(idx)
    r = _decode([_gif(2, 2, idx, lzw=full[:2])]).iloc[0]
    assert not bool(r.gif_ok)
    # index beyond a short palette: mcs=4 makes literal 9 a legal LZW
    # code, but the 4-entry color table has no entry for it
    pal4 = bytes(12)
    blob = _gif(2, 2, bytes([0, 1, 2, 9]), palette=pal4,
                lzw=_lzw_compress_ref(bytes([0, 1, 2, 9]), 4), mcs=4)
    assert not _decode([blob]).gif_ok.iloc[0]


def test_encode_decode_round_trip_batch():
    texts = [b"hello gif world", b"z", b"", b"lzw" * 99]
    pdf = pd.DataFrame({"doc_id": list(range(len(texts))), "payload": texts})
    encoded = pd.concat(gif_encode_batch(iter([pdf])))
    out = pd.concat(gif_decode_batch(iter([encoded]))).reset_index(drop=True)
    assert out.gif_ok.all()
    dims = {0: (11, 4), 1: (19, 6), 2: (27, 9)}
    for i, text in enumerate(texts):
        w, h = dims[i % 3]
        n = w * h
        want = (sum(text[k % len(text)] for k in range(n)) if text else 0)
        row = out.iloc[i]
        assert (row.width, row.height) == (w, h)
        assert row.index_sum == row.pixel_red_sum == want, i


def test_encoder_emits_genuine_gif_bytes():
    pdf = pd.DataFrame({"doc_id": [0], "payload": [b"genuine"]})
    blob = bytes(pd.concat(gif_encode_batch(iter([pdf]))).payload.iloc[0])
    assert blob[:6] == b"GIF87a"
    assert blob[-1] == 0x3B
    w, h = struct.unpack_from("<HH", blob, 6)
    assert (w, h) == (11, 4)
    assert blob[13 + 768 + 10] == 0x08  # min code size after image desc


def test_encoder_compresses_genuinely_and_generally():
    # the production encoder is real LZW: on cyclic planes it must beat
    # store-mode handily, and it must round-trip ARBITRARY index
    # streams — including ones long/random enough to force width growth
    # to 12 bits and a dictionary-full clear
    rng = np.random.RandomState(5)
    cases = [b"", b"\x00", b"aaaaaaa" * 100,
             bytes(rng.randint(0, 256, 20000, dtype=np.uint8)),
             (b"cyclic text " * 900)[:10000]]
    from zio_kinesis_example_spark.operators.multimodal_gif import (
        _lzw_compress,
    )
    for data in cases:
        assert _lzw_decode(_lzw_compress(data), 8, len(data)) == data
    plane = (b"hello gif world " * 20)[:243]
    assert len(_lzw_compress(plane)) < len(_lzw_store(plane)) / 2


def test_decode_fuzz_random_bytes_never_crash():
    rng = np.random.RandomState(11)
    payloads = [rng.bytes(rng.randint(0, 150)) for _ in range(200)]
    payloads = [(b"GIF89a" + p if i % 2 else p)
                for i, p in enumerate(payloads)]
    assert not _decode(payloads).gif_ok.any()


def test_decode_fuzz_truncations_of_valid_file():
    idx = bytes((i * 3) % 256 for i in range(24))
    good = _gif(6, 4, idx)
    outs = _decode([good[:n] for n in range(0, len(good), 5)] + [good])
    assert not outs.gif_ok.iloc[:-1].any()
    assert bool(outs.gif_ok.iloc[-1])
