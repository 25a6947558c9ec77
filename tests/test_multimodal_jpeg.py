"""The real baseline-JPEG codec: fixtures built by an INDEPENDENT
test-side encoder (different Huffman tables, its own bit packer) with
full AC content, checked against an independent direct-form IDCT;
restart markers, 16-bit quant tables, APPn/COM skipping, unsupported
layouts, and fuzzed corruption — malformed input must flip jpeg_ok,
never crash."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from zio_kinesis_example_spark.operators.multimodal_jpeg import (
    _JPEG_DIMS, ZIGZAG, _jpeg_parse_one, jpeg_decode_batch,
    jpeg_encode_batch,
)


def _decode(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return pd.concat(jpeg_decode_batch(iter([pdf]))).reset_index(drop=True)


# --- independent reference encoder ---------------------------------------
# Different table shapes from the module's encoder: DC categories at 5
# bits, the full 162-symbol AC alphabet flat at 8 bits; its own MSB-first
# packer. Emits real run-length AC coding (runs, ZRL, EOB).

_REF_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11
_REF_DC_VALS = list(range(12))
_REF_AC_VALS = ([r << 4 | s for r in range(16) for s in range(1, 11)]
                + [0x00, 0xF0])
_REF_AC_BITS = [0] * 7 + [len(_REF_AC_VALS)] + [0] * 8


def _codes(bits, vals):
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


_REF_DC_CODES = _codes(_REF_DC_BITS, _REF_DC_VALS)
_REF_AC_CODES = _codes(_REF_AC_BITS, _REF_AC_VALS)


class _RefBits:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, val: int, n: int) -> None:
        self.bits.extend((val >> i) & 1 for i in range(n - 1, -1, -1))

    def bytes_stuffed(self) -> bytes:
        bs = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for o in range(0, len(bs), 8):
            b = int("".join(map(str, bs[o:o + 8])), 2)
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _mag(v: int) -> tuple[int, int]:
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def _ref_jpeg(w: int, h: int, coefs: np.ndarray, qnat: np.ndarray,
              dri: int = 0, dqt16: bool = False,
              extra: bytes = b"") -> bytes:
    """Assemble a grayscale baseline JPEG from QUANTIZED natural-order
    coefficient blocks (nb, 8, 8), raster order."""
    dqt_vals = [int(qnat.reshape(64)[ZIGZAG[i]]) for i in range(64)]
    if dqt16:
        dqt = _seg(0xDB, bytes([0x10]) + b"".join(
            struct.pack(">H", v) for v in dqt_vals))
    else:
        dqt = _seg(0xDB, bytes([0x00]) + bytes(dqt_vals))
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = (_seg(0xC4, bytes([0x00]) + bytes(_REF_DC_BITS)
                + bytes(_REF_DC_VALS))
           + _seg(0xC4, bytes([0x10]) + bytes(_REF_AC_BITS)
                  + bytes(_REF_AC_VALS)))
    head = b"\xff\xd8" + extra + dqt + sof + dht
    if dri:
        head += _seg(0xDD, struct.pack(">H", dri))
    head += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    chunks, pred, rst = [], 0, 0
    bw = _RefBits()
    for bi, blk in enumerate(coefs):
        if dri and bi and bi % dri == 0:
            chunks.append(bw.bytes_stuffed())
            chunks.append(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            bw = _RefBits()
            pred = 0
        zz = [int(blk.reshape(64)[ZIGZAG[i]]) for i in range(64)]
        s, lob = _mag(zz[0] - pred)
        pred = zz[0]
        c, ln = _REF_DC_CODES[s]
        bw.put(c, ln)
        if s:
            bw.put(lob, s)
        k, run = 1, 0
        while k < 64:
            if zz[k] == 0:
                run += 1
            else:
                while run >= 16:
                    c, ln = _REF_AC_CODES[0xF0]
                    bw.put(c, ln)
                    run -= 16
                s, lob = _mag(zz[k])
                c, ln = _REF_AC_CODES[run << 4 | s]
                bw.put(c, ln)
                bw.put(lob, s)
                run = 0
            k += 1
        if run:
            c, ln = _REF_AC_CODES[0x00]
            bw.put(c, ln)
    chunks.append(bw.bytes_stuffed())
    return head + b"".join(chunks) + b"\xff\xd9"


def _ref_idct(coefs: np.ndarray, qnat: np.ndarray) -> np.ndarray:
    """Independent direct-form IDCT (quadruple loop, T.81 A.3.3):
    quantized blocks (nb, 8, 8) → pixel blocks (nb, 8, 8) int."""
    deq = coefs.astype(np.float64) * qnat[None, :, :]
    cu = np.array([1 / np.sqrt(2)] + [1.0] * 7)
    out = np.zeros_like(deq)
    for x in range(8):
        for y in range(8):
            acc = np.zeros(len(deq))
            for u in range(8):
                for v in range(8):
                    acc += (0.25 * cu[u] * cu[v] * deq[:, u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16))
            out[:, x, y] = acc
    return np.clip(np.round(out + 128), 0, 255).astype(np.int64)


def _blocks_to_plane(blocks: np.ndarray, bw: int, bh: int,
                     w: int, h: int) -> np.ndarray:
    return blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(bh * 8, bw * 8)[:h, :w]


def test_full_ac_stream_matches_independent_idct():
    rng = np.random.RandomState(11)
    qnat = rng.randint(1, 24, size=(8, 8)).astype(np.int64)
    coefs = np.zeros((6, 8, 8), dtype=np.int64)
    # dense low-frequency content + scattered high-frequency spikes
    coefs[:, :4, :4] = rng.randint(-30, 31, size=(6, 4, 4))
    coefs[:, 7, 7] = rng.randint(-5, 6, size=6)
    coefs[:, 0, 0] = rng.randint(-200, 201, size=6)
    blob = _ref_jpeg(21, 11, coefs, qnat)  # bw=3, bh=2 → crop both axes
    parsed = _jpeg_parse_one(blob)
    assert parsed is not None
    w, h, plane = parsed
    want = _blocks_to_plane(_ref_idct(coefs, qnat), 3, 2, 21, 11)
    # both sides are float64 IDCTs in different summation orders; JPEG's
    # own conformance bound is ±1 per sample
    assert (w, h) == (21, 11)
    assert np.abs(plane - want).max() <= 1


def test_zrl_and_long_runs_decode():
    coefs = np.zeros((1, 8, 8), dtype=np.int64)
    zz_positions = [1, 20, 40, 63]  # forces runs > 16 → ZRL symbols
    flat = np.zeros(64, dtype=np.int64)
    for p in zz_positions:
        flat[ZIGZAG[p]] = 7
    coefs[0] = flat.reshape(8, 8)
    qnat = np.ones((8, 8), dtype=np.int64)
    blob = _ref_jpeg(8, 8, coefs, qnat)
    parsed = _jpeg_parse_one(blob)
    assert parsed is not None
    want = _ref_idct(coefs, qnat)[0]
    assert np.abs(parsed[2] - want).max() <= 1


def test_restart_markers_reset_dc_prediction():
    # DC-only blocks; without the per-restart predictor reset the
    # decoded DC chain (and so the sums) would differ
    coefs = np.zeros((4, 8, 8), dtype=np.int64)
    coefs[:, 0, 0] = [80, -40, 60, -90]
    qnat = np.ones((8, 8), dtype=np.int64)
    blob = _ref_jpeg(32, 8, coefs, qnat, dri=2)
    assert b"\xff\xd0" in blob  # a real RST0 is present
    parsed = _jpeg_parse_one(blob)
    assert parsed is not None
    want = _blocks_to_plane(_ref_idct(coefs, qnat), 4, 1, 32, 8)
    assert np.array_equal(parsed[2], want)


def test_fill_bytes_before_rst_and_eoi_decode():
    """T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
    fill bytes — including RSTn and EOI after the entropy scan. The r8
    fix: the scan loop previously classified FF FF as end-of-scan and
    failed the EOI check on these conformant files. (Inside entropy
    data FF is always stuffed as FF 00, so FF D0 / FF D9 occur only at
    the real markers and targeted replacement is safe.)"""
    coefs = np.zeros((4, 8, 8), dtype=np.int64)
    coefs[:, 0, 0] = [80, -40, 60, -90]
    qnat = np.ones((8, 8), dtype=np.int64)
    blob = _ref_jpeg(32, 8, coefs, qnat, dri=2)
    assert b"\xff\xd0" in blob and blob.endswith(b"\xff\xd9")
    want = _jpeg_parse_one(blob)
    assert want is not None
    padded = blob.replace(b"\xff\xd0", b"\xff\xff\xd0", 1)
    padded = padded[:-2] + b"\xff\xff\xff" + b"\xff\xd9"
    parsed = _jpeg_parse_one(padded)
    assert parsed is not None
    assert parsed[:2] == want[:2]
    assert np.array_equal(parsed[2], want[2])


def test_16bit_dqt_and_skipped_segments():
    coefs = np.zeros((1, 8, 8), dtype=np.int64)
    coefs[0, 0, 0] = 40
    qnat = np.full((8, 8), 300, dtype=np.int64)  # needs 16-bit precision
    extra = (_seg(0xE1, b"Exif\x00\x00junk") + _seg(0xFE, b"a comment"))
    blob = _ref_jpeg(8, 8, coefs, qnat, dqt16=True, extra=extra)
    parsed = _jpeg_parse_one(blob)
    assert parsed is not None
    want = _ref_idct(coefs, qnat)[0]
    assert np.array_equal(parsed[2], want)


def test_rejects_unsupported_layouts():
    coefs = np.zeros((1, 8, 8), dtype=np.int64)
    qnat = np.ones((8, 8), dtype=np.int64)
    good = _ref_jpeg(8, 8, coefs, qnat)
    # progressive SOF2 / three components / 2x2 subsampling / no EOI
    sof0 = _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    prog = good.replace(sof0, _seg(0xC2, struct.pack(
        ">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])))
    tri = good.replace(sof0, _seg(0xC0, struct.pack(
        ">BHHB", 8, 8, 8, 3) + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])))
    sub = good.replace(sof0, _seg(0xC0, struct.pack(
        ">BHHB", 8, 8, 8, 1) + bytes([1, 0x22, 0])))
    no_eoi = good[:-2]
    out = _decode([prog, tri, sub, no_eoi, good])
    assert list(out.jpeg_ok) == [False, False, False, False, True]


def test_module_round_trip_is_exact():
    texts = [b"hello jpeg world", b"a", b"", b"xyz" * 50, bytes(range(256))]
    pdf = pd.DataFrame({"doc_id": list(range(len(texts))),
                        "payload": texts})
    enc = pd.concat(jpeg_encode_batch(iter([pdf])))
    out = pd.concat(jpeg_decode_batch(iter([enc]))).reset_index(drop=True)
    assert out.jpeg_ok.all()
    for i, text in enumerate(texts):
        w, h = _JPEG_DIMS[i % 3]
        bw, bh = (w + 7) // 8, (h + 7) // 8

        def byte(m):
            return text[m % len(text)] if text else 0

        pix = sum(byte(m) * min(8, w - (m % bw) * 8)
                  * min(8, h - (m // bw) * 8) for m in range(bw * bh))
        row = out.iloc[i]
        assert (row.width, row.height, row.n_blocks) == (w, h, bw * bh)
        assert row.row0_sum == sum(byte(m) * min(8, w - m * 8)
                                   for m in range(bw))
        assert row.pixel_sum == pix, i


def test_module_encoder_stuffs_ff_bytes():
    # payloads found by search whose DC bit patterns pack an 0xFF scan
    # byte — the encoder must stuff it and the decoder must unstuff it
    texts = [bytes.fromhex(t) for t in ("b132", "b0f87821", "4285c2")]
    pdf = pd.DataFrame({"doc_id": [2] * len(texts), "payload": texts})
    enc = pd.concat(jpeg_encode_batch(iter([pdf])))
    stuffed = 0
    for blob in enc.payload:
        blob = bytes(blob)
        scan = blob[blob.rindex(b"\xff\xda") + 14:-2]
        assert b"\xff" not in scan.replace(b"\xff\x00", b"")
        stuffed += scan.count(b"\xff\x00")
    assert stuffed >= 3
    out = pd.concat(jpeg_decode_batch(iter([enc])))
    assert out.jpeg_ok.all()


def test_decode_fuzz_truncations_of_valid_file():
    pdf = pd.DataFrame({"doc_id": [0], "payload": [b"truncation fuzz"]})
    good = bytes(pd.concat(jpeg_encode_batch(iter([pdf]))).payload.iloc[0])
    outs = _decode([good[:n] for n in range(len(good))] + [good])
    assert not outs.jpeg_ok.iloc[:-1].any()
    assert bool(outs.jpeg_ok.iloc[-1])


def test_decode_fuzz_random_and_bitflips_never_crash():
    rng = np.random.RandomState(7)
    pdf = pd.DataFrame({"doc_id": [1], "payload": [b"bitflip target"]})
    good = bytes(pd.concat(jpeg_encode_batch(iter([pdf]))).payload.iloc[0])
    payloads = [rng.bytes(rng.randint(0, 250)) for _ in range(150)]
    payloads += [b"\xff\xd8" + rng.bytes(rng.randint(0, 250))
                 for _ in range(150)]
    for _ in range(200):  # single-bit flips of a valid file
        i = rng.randint(len(good))
        payloads.append(good[:i] + bytes([good[i] ^ (1 << rng.randint(8))])
                        + good[i + 1:])
    out = _decode(payloads)
    # decoding must never raise; flipped files either fail or still parse
    # (flips in skipped APP0 bytes are legitimately invisible)
    assert len(out) == len(payloads)
    assert not out.jpeg_ok.iloc[:300].any()


# The real ITU T.81 Annex K luminance tables: MULTI-LENGTH canonical
# codes (both this file's reference encoder and the module encoder use
# single-length tables, so without this fixture the canonical
# across-length code assignment in _build_huff would go unexercised).
_K_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_VALS = list(range(12))
_K_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def test_decode_with_real_annex_k_multi_length_tables(monkeypatch):
    """Decode a full-AC stream Huffman-coded with the genuine T.81
    Annex K luminance tables (code lengths 2..16): exercises canonical
    code assignment ACROSS lengths in _build_huff/read_huff, which the
    single-length encoder tables cannot."""
    import tests.test_multimodal_jpeg as t

    monkeypatch.setattr(t, "_REF_DC_CODES", _codes(_K_DC_BITS, _K_DC_VALS))
    monkeypatch.setattr(t, "_REF_AC_CODES", _codes(_K_AC_BITS, _K_AC_VALS))
    monkeypatch.setattr(t, "_REF_DC_BITS", _K_DC_BITS)
    monkeypatch.setattr(t, "_REF_DC_VALS", _K_DC_VALS)
    monkeypatch.setattr(t, "_REF_AC_BITS", _K_AC_BITS)
    monkeypatch.setattr(t, "_REF_AC_VALS", _K_AC_VALS)
    rng = np.random.RandomState(3)
    qnat = rng.randint(1, 20, size=(8, 8)).astype(np.int64)
    coefs = np.zeros((6, 8, 8), dtype=np.int64)
    coefs[:, :3, :3] = rng.randint(-20, 21, size=(6, 3, 3))
    coefs[:, 0, 0] = rng.randint(-300, 301, size=6)
    blob = t._ref_jpeg(21, 11, coefs, qnat)
    parsed = _jpeg_parse_one(blob)
    assert parsed is not None
    want = t._blocks_to_plane(t._ref_idct(coefs, qnat), 3, 2, 21, 11)
    assert np.abs(parsed[2] - want).max() <= 1


# --- 4:2:0 color path -----------------------------------------------------

from zio_kinesis_example_spark.operators.multimodal_jpeg import (  # noqa: E402
    _JPEG420_DIMS, _jpeg_parse, jpeg420_decode_batch, jpeg420_encode_batch,
)


def _decode420(payloads: list[bytes]) -> pd.DataFrame:
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})
    return pd.concat(jpeg420_decode_batch(iter([pdf]))).reset_index(drop=True)


def _ref_jpeg_multi(w: int, h: int, comps, dri: int = 0) -> bytes:
    """Independent multi-component interleaved encoder: comps is a list
    of (h_i, v_i, qnat, coefs) with coefs a (gh, gw, 8, 8) QUANTIZED
    natural-order block grid (gh = ceil(h/(8*vmax))*v_i etc.). All
    components share the flat reference tables (legal; the per-component
    DC predictors are still separate state the decoder must keep)."""
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mxn = (w + 8 * hmax - 1) // (8 * hmax)
    myn = (h + 8 * vmax - 1) // (8 * vmax)
    dqt = b"".join(
        _seg(0xDB, bytes([ci]) + bytes(
            int(qnat.reshape(64)[ZIGZAG[i]]) for i in range(64)))
        for ci, (_h, _v, qnat, _c) in enumerate(comps))
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(
        bytes([ci + 1, (h_i << 4) | v_i, ci])
        for ci, (h_i, v_i, _q, _c) in enumerate(comps)))
    dht = (_seg(0xC4, bytes([0x00]) + bytes(_REF_DC_BITS)
                + bytes(_REF_DC_VALS))
           + _seg(0xC4, bytes([0x10]) + bytes(_REF_AC_BITS)
                  + bytes(_REF_AC_VALS)))
    head = b"\xff\xd8" + dqt + sof + dht
    if dri:
        head += _seg(0xDD, struct.pack(">H", dri))
    head += _seg(0xDA, bytes([len(comps)]) + b"".join(
        bytes([ci + 1, 0x00]) for ci in range(len(comps)))
        + bytes([0, 63, 0]))

    def put_block(bw, zz, pred):
        s, lob = _mag(zz[0] - pred)
        c, ln = _REF_DC_CODES[s]
        bw.put(c, ln)
        if s:
            bw.put(lob, s)
        k, run = 1, 0
        while k < 64:
            if zz[k] == 0:
                run += 1
            else:
                while run >= 16:
                    c, ln = _REF_AC_CODES[0xF0]
                    bw.put(c, ln)
                    run -= 16
                s, lob = _mag(zz[k])
                c, ln = _REF_AC_CODES[run << 4 | s]
                bw.put(c, ln)
                bw.put(lob, s)
                run = 0
            k += 1
        if run:
            c, ln = _REF_AC_CODES[0x00]
            bw.put(c, ln)
        return zz[0]

    chunks, rst = [], 0
    preds = [0] * len(comps)
    bw = _RefBits()
    for mcu in range(mxn * myn):
        if dri and mcu and mcu % dri == 0:
            chunks.append(bw.bytes_stuffed())
            chunks.append(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            bw = _RefBits()
            preds = [0] * len(comps)
        mx, my = mcu % mxn, mcu // mxn
        for ci, (h_i, v_i, _q, coefs) in enumerate(comps):
            for bv in range(v_i):
                for bh_ in range(h_i):
                    blk = coefs[my * v_i + bv, mx * h_i + bh_]
                    zz = [int(blk.reshape(64)[ZIGZAG[i]])
                          for i in range(64)]
                    preds[ci] = put_block(bw, zz, preds[ci])
    chunks.append(bw.bytes_stuffed())
    return head + b"".join(chunks) + b"\xff\xd9"


def test_420_full_ac_interleaved_matches_independent_idct():
    rng = np.random.RandomState(21)
    w, h = 21, 19  # mxn=2, myn=2: Y grid 4x4 blocks, chroma 2x2
    comps = []
    for (h_i, v_i, gw, gh) in ((2, 2, 4, 4), (1, 1, 2, 2), (1, 1, 2, 2)):
        qnat = rng.randint(1, 18, size=(8, 8)).astype(np.int64)
        coefs = np.zeros((gh, gw, 8, 8), dtype=np.int64)
        coefs[:, :, :3, :3] = rng.randint(-25, 26, size=(gh, gw, 3, 3))
        coefs[:, :, 0, 0] = rng.randint(-200, 201, size=(gh, gw))
        comps.append((h_i, v_i, qnat, coefs))
    blob = _ref_jpeg_multi(w, h, comps)
    parsed = _jpeg_parse(blob)
    assert parsed is not None and len(parsed[2]) == 3
    dims = ((21, 19), (11, 10), (11, 10))
    for ci, (h_i, v_i, qnat, coefs) in enumerate(comps):
        gh, gw = coefs.shape[:2]
        want = _ref_idct(coefs.reshape(-1, 8, 8), qnat) \
            .reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(gh * 8, gw * 8)[:dims[ci][1], :dims[ci][0]]
        assert np.abs(parsed[2][ci] - want).max() <= 1, ci


def test_420_restart_markers_reset_all_predictors():
    rng = np.random.RandomState(4)
    w, h = 32, 32  # 2x2 MCUs
    comps = []
    for (h_i, v_i, gw, gh) in ((2, 2, 4, 4), (1, 1, 2, 2), (1, 1, 2, 2)):
        qnat = np.ones((8, 8), dtype=np.int64)
        coefs = np.zeros((gh, gw, 8, 8), dtype=np.int64)
        coefs[:, :, 0, 0] = rng.randint(-120, 121, size=(gh, gw))
        comps.append((h_i, v_i, qnat, coefs))
    blob = _ref_jpeg_multi(w, h, comps, dri=1)  # RST after every MCU
    assert b"\xff\xd0" in blob
    parsed = _jpeg_parse(blob)
    assert parsed is not None
    for ci, (h_i, v_i, qnat, coefs) in enumerate(comps):
        gh, gw = coefs.shape[:2]
        want = _ref_idct(coefs.reshape(-1, 8, 8), qnat) \
            .reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(gh * 8, gw * 8)
        want = want[:parsed[2][ci].shape[0], :parsed[2][ci].shape[1]]
        assert np.array_equal(parsed[2][ci], want), ci


def test_420_kernel_strictness_and_crossrejects():
    # grayscale files are not 4:2:0; 4:2:0 files are not grayscale
    gray = pd.DataFrame({"doc_id": [0], "payload": [b"gray"]})
    gray_blob = bytes(pd.concat(
        jpeg_encode_batch(iter([gray]))).payload.iloc[0])
    color = pd.DataFrame({"doc_id": [0], "payload": [b"color"]})
    color_blob = bytes(pd.concat(
        jpeg420_encode_batch(iter([color]))).payload.iloc[0])
    assert not _decode420([gray_blob]).jpeg_ok.iloc[0]
    assert not _decode([color_blob]).jpeg_ok.iloc[0]
    # but the general parser decodes both
    assert len(_jpeg_parse(gray_blob)[2]) == 1
    assert len(_jpeg_parse(color_blob)[2]) == 3


def test_420_rejects_unsupported_samplings():
    qnat = np.ones((8, 8), dtype=np.int64)
    blk = np.zeros((1, 1, 8, 8), dtype=np.int64)
    # 2x1 luma (4:2:2) and 3-component with 2x2 chroma: both outside
    # the supported set, structurally valid otherwise
    for sampl in (((2, 1), (1, 1), (1, 1)), ((2, 2), (2, 2), (1, 1))):
        hmax = max(hv[0] for hv in sampl)
        vmax = max(hv[1] for hv in sampl)
        mxn = (16 + 8 * hmax - 1) // (8 * hmax)
        myn = (16 + 8 * vmax - 1) // (8 * vmax)
        comps = [(hv[0], hv[1], qnat,
                  np.zeros((myn * hv[1], mxn * hv[0], 8, 8),
                           dtype=np.int64))
                 for hv in sampl]
        blob = _ref_jpeg_multi(16, 16, comps)
        assert _jpeg_parse(blob) is None
    assert _jpeg_parse(_ref_jpeg_multi(8, 8, [(1, 1, qnat, blk)] * 3)) \
        is not None  # 4:4:4 is supported


def test_420_module_round_trip_is_exact():
    texts = [b"color jpeg world", b"a", b"", b"xyz" * 70]
    pdf = pd.DataFrame({"doc_id": list(range(len(texts))),
                        "payload": texts})
    out = pd.concat(jpeg420_decode_batch(
        jpeg420_encode_batch(iter([pdf])))).reset_index(drop=True)
    assert out.jpeg_ok.all()
    for i, text in enumerate(texts):
        w, h = _JPEG420_DIMS[i % 3]
        mxn, myn = (w + 15) // 16, (h + 15) // 16
        cw, ch = (w + 1) // 2, (h + 1) // 2

        def byte(m):
            return text[m % len(text)] if text else 0

        ys = cb = cr = 0
        for m in range(6 * mxn * myn):
            mcu, j = m // 6, m % 6
            mx, my = mcu % mxn, mcu // mxn
            if j < 4:
                ys += byte(m) * (max(0, min(8, w - mx * 16 - (j % 2) * 8))
                                 * max(0, min(8, h - my * 16 - (j // 2) * 8)))
            else:
                vis = (max(0, min(8, cw - mx * 8))
                       * max(0, min(8, ch - my * 8)))
                if j == 4:
                    cb += byte(m) * vis
                else:
                    cr += byte(m) * vis
        r = out.iloc[i]
        assert (r.width, r.height, r.n_mcus) == (w, h, mxn * myn)
        assert (r.y_sum, r.cb_sum, r.cr_sum) == (ys, cb, cr), i


def test_420_truncation_fuzz_never_crashes():
    pdf = pd.DataFrame({"doc_id": [0], "payload": [b"trunc fuzz 420"]})
    good = bytes(pd.concat(
        jpeg420_encode_batch(iter([pdf]))).payload.iloc[0])
    outs = _decode420([good[:n] for n in range(0, len(good), 3)] + [good])
    assert not outs.jpeg_ok.iloc[:-1].any()
    assert bool(outs.jpeg_ok.iloc[-1])


def test_420_kernel_rejects_1x1_444_shape_coincidence():
    """Review finding: a 1x1 three-component 4:4:4 file's plane shapes
    coincide with 4:2:0's ((1,1) chroma dims) - the strict kernel must
    classify by SAMPLING FACTORS, not shapes."""
    qnat = np.ones((8, 8), dtype=np.int64)
    blk = np.zeros((1, 1, 8, 8), dtype=np.int64)
    blob = _ref_jpeg_multi(1, 1, [(1, 1, qnat, blk)] * 3)
    parsed = _jpeg_parse(blob)
    assert parsed is not None and parsed[3] == ((1, 1), (1, 1), (1, 1))
    assert not _decode420([blob]).jpeg_ok.iloc[0]


def test_parse_bounds_padded_multi_component_allocation():
    """A hostile SOF passing the raw w*h guard but whose padded MCU
    grids would allocate several times the calibrated bound must fail
    cleanly (never OOM the never-crash fuzz paths)."""
    w, h = 1, 1 << 22  # w*h == _JPEG_MAX_PIXELS, padded grids ~4x
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h & 0xFFFF, w, 3)
               + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    # h wraps the 16-bit field; construct directly at the field max
    h = 0xFFFF
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, 63, 3)
               + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    dht = (_seg(0xC4, bytes([0x00]) + bytes(_REF_DC_BITS)
                + bytes(_REF_DC_VALS))
           + _seg(0xC4, bytes([0x10]) + bytes(_REF_AC_BITS)
                  + bytes(_REF_AC_VALS)))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    blob = b"\xff\xd8" + dqt + sof + dht + sos + b"\x00" + b"\xff\xd9"
    # 63 * 65535 = 4.1M pixels < 2^22? 63*65535 = 4128705 < 4194304 OK
    assert 63 * 65535 <= (1 << 22)
    assert _jpeg_parse(blob) is None


def test_recover_corrupted_mid_segment_resyncs_at_rst():
    """Recovery (r8): corrupting ONE restart segment's entropy bytes
    loses exactly that segment's MCUs; every other segment decodes
    bit-identically to the clean file (DC predictor reset at resync)."""
    from zio_kinesis_example_spark.operators.multimodal_jpeg import _jpeg_parse

    coefs = np.zeros((6, 8, 8), dtype=np.int64)
    coefs[:, 0, 0] = [80, -40, 60, -90, 30, -10]
    coefs[:, 1, 1] = [5, -3, 2, -7, 4, -1]  # real AC content too
    qnat = np.ones((8, 8), dtype=np.int64)
    blob = _ref_jpeg(48, 8, coefs, qnat, dri=2)  # 3 segments, RST0+RST1
    clean = _jpeg_parse(blob, recover=True)
    assert clean is not None and not clean[4].any()
    # blank the MIDDLE segment (between RST0 and RST1) entirely
    i0 = blob.index(b"\xff\xd0")
    i1 = blob.index(b"\xff\xd1")
    corrupted = blob[:i0 + 2] + blob[i1:]
    got = _jpeg_parse(corrupted, recover=True)
    assert got is not None
    lost = got[4]
    assert lost.tolist() == [False, False, True, True, False, False]
    # surviving blocks decode identically to the clean file's
    plane_c, plane_g = clean[2][0], got[2][0]
    assert np.array_equal(plane_c[:, :16], plane_g[:, :16])   # seg 0
    assert np.array_equal(plane_c[:, 32:], plane_g[:, 32:])   # seg 2
    # strict mode still rejects the corrupted file outright
    assert _jpeg_parse(corrupted) is None


def test_recover_missing_tail_marks_rest_lost():
    from zio_kinesis_example_spark.operators.multimodal_jpeg import _jpeg_parse

    coefs = np.zeros((4, 8, 8), dtype=np.int64)
    coefs[:, 0, 0] = [80, -40, 60, -90]
    qnat = np.ones((8, 8), dtype=np.int64)
    blob = _ref_jpeg(32, 8, coefs, qnat, dri=2)
    i0 = blob.index(b"\xff\xd0")
    truncated = blob[:i0] + b"\xff\xd9"  # drop RST0 + second segment
    got = _jpeg_parse(truncated, recover=True)
    assert got is not None
    assert got[4].tolist() == [False, False, True, True]
    assert np.array_equal(got[2][0][:, :16],
                          _jpeg_parse(blob, recover=True)[2][0][:, :16])


def test_recover_rejects_multi_component_scans():
    """Recovery is defined for single-component 1x1 scans only."""
    from zio_kinesis_example_spark.operators.multimodal_jpeg import (
        _jpeg_parse, jpeg420_encode_batch,
    )

    pdf = pd.DataFrame({"doc_id": [0], "payload": [b"abc"]})
    blob = bytes(next(jpeg420_encode_batch(iter([pdf])))["payload"][0])
    assert _jpeg_parse(blob) is not None         # valid color file
    assert _jpeg_parse(blob, recover=True) is None


def test_recover_total_loss_single_segment():
    """No restart anchor (one segment) → corruption loses everything,
    but the file still reports structure (planes all zeroed/neutral)."""
    from zio_kinesis_example_spark.operators.multimodal_jpeg import _jpeg_parse

    coefs = np.zeros((2, 8, 8), dtype=np.int64)
    coefs[:, 0, 0] = [80, -40]
    qnat = np.ones((8, 8), dtype=np.int64)
    blob = _ref_jpeg(16, 8, coefs, qnat)
    # strip the whole entropy scan: headers end at SOS payload end
    sos_at = blob.index(b"\xff\xda")
    sos_len = int.from_bytes(blob[sos_at + 2:sos_at + 4], "big")
    headers = blob[:sos_at + 2 + sos_len]
    got = _jpeg_parse(headers + b"\xff\xd9", recover=True)
    assert got is not None
    assert got[4].tolist() == [True, True]
