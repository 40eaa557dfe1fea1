"""Baseline-JPEG decoder tests: a minimal spec-faithful ENCODER built here
(T.81 annex-F flow: level shift -> FDCT -> quantize -> zigzag -> canonical
Huffman, byte stuffing, optional restart markers) drives the decoder with
known pixels. Flat blocks round-trip EXACTLY (their DCT has a single
integer DC coefficient); textured blocks are asserted against the same
quantize->dequantize->IDCT reference the encoder math implies (<= 1 LSB).
No Spark needed — pure python/numpy.
"""

from __future__ import annotations

import numpy as np

from titanlib_spark.textops.multimodal import (
    _JPEG_IDCT_A,
    _JPEG_ZIGZAG,
    decode_jpeg,
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _canonical_8bit(symbols: list[int]) -> tuple[bytes, bytes, dict]:
    """All-codes-8-bits canonical Huffman table over the given symbols.
    Returns (counts16, symbols, symbol -> (code, 8))."""
    symbols = sorted(set(symbols))
    assert len(symbols) < 250
    counts = bytes([0] * 7 + [len(symbols)] + [0] * 8)
    codes = {}
    code = 0
    # canonical: lengths 1..7 empty, so first 8-bit code = 0
    for s in symbols:
        codes[s] = (code, 8)
        code += 1
    return counts, bytes(symbols), codes


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v else 0


def _mag_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _fdct_quant(block: np.ndarray) -> np.ndarray:
    """Level shift -> 2-D DCT-II (via the decoder's basis, which is its
    exact inverse) -> quantize by the all-ones table -> zigzag ints."""
    coef = _JPEG_IDCT_A @ (block.astype(np.float64) - 128.0) @ _JPEG_IDCT_A.T
    return np.rint(coef.reshape(64)).astype(np.int64)[_JPEG_ZIGZAG]


def _encode_blocks_bits(
    bw: _BitWriter, blocks: list[np.ndarray], pred0: int, dc_codes, ac_codes
) -> int:
    pred = pred0
    for block in blocks:
        zz = _fdct_quant(block)
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = _category(diff)
        bw.write(*dc_codes[s])
        if s:
            bw.write(_mag_bits(diff, s), s)
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run += 1
                k += 1
            if k == 64:
                bw.write(*ac_codes[0x00])  # EOB
                break
            while run >= 16:
                bw.write(*ac_codes[0xF0])  # ZRL
                run -= 16
            s = _category(int(zz[k]))
            bw.write(*ac_codes[(run << 4) | s])
            bw.write(_mag_bits(int(zz[k]), s), s)
            k += 1
    return pred


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _blocks_of(plane: np.ndarray) -> list[np.ndarray]:
    h, w = plane.shape
    return [
        plane[y : y + 8, x : x + 8]
        for y in range(0, h, 8)
        for x in range(0, w, 8)
    ]


def jpeg_encode_gray(pix: np.ndarray, restart: int = 0) -> bytes:
    h, w = pix.shape
    assert h % 8 == 0 and w % 8 == 0
    dc_counts, dc_syms, dc_codes = _canonical_8bit(list(range(12)))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ac_counts, ac_syms_b, ac_codes = _canonical_8bit(ac_syms)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + dc_counts + dc_syms)
    out += _seg(0xC4, bytes([0x10]) + ac_counts + ac_syms_b)
    if restart:
        out += _seg(0xDD, restart.to_bytes(2, "big"))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    blocks = _blocks_of(pix)
    if restart:
        pred, rst = 0, 0
        for i in range(0, len(blocks), restart):
            bw = _BitWriter()
            _encode_blocks_bits(bw, blocks[i : i + restart], 0, dc_codes, ac_codes)
            out += bw.flush()
            if i + restart < len(blocks):
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
    else:
        bw = _BitWriter()
        _encode_blocks_bits(bw, blocks, 0, dc_codes, ac_codes)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def jpeg_encode_420(rgb: np.ndarray) -> bytes:
    """4:2:0 color encoder: Y at full res (2x2 blocks per MCU), Cb/Cr
    downsampled by 2x2 mean (one block each per MCU)."""
    h, w = rgb.shape[:2]
    assert h % 16 == 0 and w % 16 == 0
    y, cb, cr = _rgb_to_ycbcr(rgb)
    cb_d = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr_d = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    dc_counts, dc_syms, dc_codes = _canonical_8bit(list(range(12)))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ac_counts, ac_syms_b, ac_codes = _canonical_8bit(ac_syms)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + dc_counts + dc_syms)
    out += _seg(0xC4, bytes([0x10]) + ac_counts + ac_syms_b)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(h // 16):
        for mx in range(w // 16):
            yb = [
                y[my * 16 + by * 8 : my * 16 + by * 8 + 8,
                  mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8]
                for by in range(2) for bx in range(2)
            ]
            preds[1] = _encode_blocks_bits(bw, yb, preds[1], dc_codes, ac_codes)
            cbb = cb_d[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            preds[2] = _encode_blocks_bits(bw, [cbb], preds[2], dc_codes, ac_codes)
            crb = cr_d[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            preds[3] = _encode_blocks_bits(bw, [crb], preds[3], dc_codes, ac_codes)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _reference_roundtrip(pix: np.ndarray) -> np.ndarray:
    """What lossless-qtable baseline JPEG should reconstruct: per block,
    rint(DCT coefficients) -> IDCT -> +128 -> rint/clip."""
    out = np.zeros_like(pix, dtype=np.float64)
    for y0 in range(0, pix.shape[0], 8):
        for x0 in range(0, pix.shape[1], 8):
            b = pix[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64)
            coef = np.rint(_JPEG_IDCT_A @ (b - 128.0) @ _JPEG_IDCT_A.T)
            out[y0 : y0 + 8, x0 : x0 + 8] = (
                _JPEG_IDCT_A.T @ coef @ _JPEG_IDCT_A + 128.0
            )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def test_jpeg_flat_gray_exact():
    pix = np.full((8, 8), 77, dtype=np.uint8)
    out = decode_jpeg(jpeg_encode_gray(pix))
    assert out is not None and out.shape == (8, 8, 3)
    assert np.array_equal(out, np.repeat(pix[:, :, None], 3, axis=2))


def test_jpeg_textured_gray_matches_reference_roundtrip():
    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    out = decode_jpeg(jpeg_encode_gray(pix))
    assert out is not None and out.shape == (16, 24, 3)
    ref = _reference_roundtrip(pix)
    assert int(np.abs(out[:, :, 0].astype(int) - ref.astype(int)).max()) <= 1


def test_jpeg_restart_markers():
    rng = np.random.default_rng(9)
    pix = rng.integers(0, 256, (8, 32), dtype=np.uint8)
    plain = decode_jpeg(jpeg_encode_gray(pix))
    rst = decode_jpeg(jpeg_encode_gray(pix, restart=1))
    assert plain is not None and rst is not None
    assert np.array_equal(plain, rst)


def test_jpeg_420_color_flat_quadrants():
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[:8, :8] = (200, 30, 30)
    rgb[:8, 8:] = (30, 200, 30)
    rgb[8:, :8] = (30, 30, 200)
    rgb[8:, 8:] = (120, 120, 120)
    out = decode_jpeg(jpeg_encode_420(rgb))
    assert out is not None and out.shape == (16, 16, 3)
    # flat quadrants survive 4:2:0 (2x2 means are exact on flat color);
    # losses are only coefficient rounding + YCbCr round trip
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= 2


def test_jpeg_rejects_unsupported_and_corrupt():
    pix = np.full((8, 8), 50, dtype=np.uint8)
    good = jpeg_encode_gray(pix)
    assert decode_jpeg(good[: len(good) // 2]) is None  # truncated
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # empty frame
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(progressive) is None  # SOF2 unsupported
    assert decode_jpeg(b"not a jpeg") is None


def test_jpeg_through_image_kernel():
    from titanlib_spark.textops.multimodal import _decode_image_kernel

    pix = np.full((8, 8), 99, dtype=np.uint8)
    img, ok = _decode_image_kernel(jpeg_encode_gray(pix), 8, 8, "error")
    assert ok is True and np.array_equal(img[:, :, 0], pix)


def test_jpeg_batch_matches_serial():
    """The vectorized batch entropy decoder must be pixel-identical to the
    serial reference twin across shapes (gray, smooth, 4:2:0 color,
    restart markers) and must map every reject to the same None."""
    from titanlib_spark.textops.multimodal import decode_jpeg_batch

    rng = np.random.default_rng(17)
    payloads = []
    for _ in range(6):
        payloads.append(
            jpeg_encode_gray(rng.integers(0, 256, (16, 16), dtype=np.uint8))
        )
    payloads.append(
        jpeg_encode_gray(rng.integers(0, 256, (8, 32), dtype=np.uint8), restart=2)
    )
    payloads.append(
        jpeg_encode_420(rng.integers(0, 256, (16, 32, 3), dtype=np.uint8))
    )
    good = payloads[0]
    payloads += [
        good[: len(good) // 2],          # truncated
        b"\xff\xd8\xff\xd9",             # empty frame
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive
        b"not a jpeg",
        None,
    ]
    batch = decode_jpeg_batch(payloads)
    for p, b in zip(payloads, batch):
        s = decode_jpeg(p) if isinstance(p, bytes) else None
        assert (s is None) == (b is None)
        if s is not None:
            assert np.array_equal(s, b)
