"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Real pure-python decoders, no codec library needed: binary PPM (P6) and
24-bit BI_RGB BMP images, non-interlaced 8-bit PNG (stdlib zlib inflate +
numpy scanline unfilter, all five color types), baseline sequential JPEG
(SOF0: canonical Huffman entropy decode, dequantize, float IDCT, chroma
upsample, YCbCr->RGB), PCM-16 WAV audio. Remaining formats (progressive
JPEG, MP3) need PIL/torchaudio, so unknown payloads HARD-ERROR by
default (`on_undecodable="error"`); callers opt
into NULL features + a decode_ok=false flag ("null") or, for synthetic
fixtures/oracles only, a clearly-marked deterministic fake ("fake").
Everything Spark-side — schema, batch shape, Arrow transfer,
partitioning — is real and tested under every policy.

Design rules for 100 TB media:
* media stays an opaque `binary` column with typed metadata alongside
  (media_type, width, height, duration_s, sample_rate) — decode late,
  decode once, never collect;
* per-batch processing via mapInPandas so one Arrow batch = one python
  call (batch size bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  to cap executor memory per media batch);
* derived features (embeddings, thumbnails, frames) are new columns /
  exploded rows, not driver-side objects.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

# undecodable-payload policy for image_features (fail-loud by default):
#   "error" — raise NotImplementedError (a codec gap at 100 TB must be a
#             loud failure, never silently-wrong features);
#   "null"  — feature NULL + decode_ok false (rows are range-checkable
#             downstream, the metadata_check idiom);
#   "fake"  — deterministic arithmetic pixel field + decode_ok false
#             (synthetic fixtures / oracle replay ONLY — opt-in).
_UNDECODABLE_POLICIES = ("error", "null", "fake")


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Real decoder for binary PPM (P6, maxval 255): pure numpy, no codec.
    Returns (h, w, 3) uint8 or None if the payload is not a valid P6."""
    if payload[:2] != b"P6":
        return None
    # header = three whitespace-separated tokens (w h maxval) after the
    # magic; '#' comments run to end of line (Netpbm spec)
    i, tokens = 2, []
    while len(tokens) < 3 and i < len(payload):
        ch = payload[i : i + 1]
        if ch == b"#":
            nl = payload.find(b"\n", i)
            if nl < 0:
                return None
            i = nl + 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3 or i >= len(payload):
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    i += 1  # exactly one whitespace byte separates header from raster
    raster = payload[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        return None
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Real decoder for uncompressed 24-bit BMP (BI_RGB, BITMAPINFOHEADER):
    bottom-up BGR rows padded to 4 bytes. Returns (h, w, 3) uint8 RGB or
    None if the payload is not such a BMP."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    off = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0  # positive height = bottom-up
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = payload[off : off + stride * h]
    if len(raster) != stride * h:
        return None
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if flip else img).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray | None:
    """Undo PNG per-scanline filters (0 none / 1 sub / 2 up / 3 average /
    4 paeth). `raw` is h rows of (1 filter byte + stride data bytes).
    Up is vectorized across the row; Sub/Average/Paeth carry a per-pixel
    recurrence, so those rows run a byte loop — exact, and cheap at the
    thumbnail sizes a QC pipeline decodes (a production deployment slots
    a codec library in above this fallback)."""
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint16)  # u16: sums before & 0xFF
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.uint16)
        if ftype == 0:
            line = cur
        elif ftype == 2:  # up
            line = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):
            line = cur.copy()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    line[x] = (line[x] + ((int(a) + int(b)) >> 1)) & 0xFF
                else:  # paeth
                    c = prev[x - bpp] if x >= bpp else 0  # up-left
                    p = int(a) + int(b) - int(c)
                    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (line[x] + pred) & 0xFF
        else:
            return None  # invalid filter type: fail the whole decode
        out[y] = line
        prev = line
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray | None:
    """Real decoder for non-interlaced 8-bit-depth PNG (gray, gray+alpha,
    RGB, RGBA, and palette color types): stdlib zlib inflate + numpy
    per-scanline unfilter — no codec library. Returns (h, w, 3) uint8 RGB
    (alpha dropped, gray broadcast, palette looked up) or None if the
    payload is not such a PNG (bad signature/CRC-length structure,
    interlaced, 16-bit, truncated or corrupt raster)."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        return None
    pos = len(_PNG_SIG)
    w = h = None
    depth = ctype = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        cid = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            return None  # truncated chunk
        if cid == b"IHDR":
            if clen != 13:
                return None
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype = body[8], body[9]
            interlace = body[12]
        elif cid == b"PLTE":
            if clen % 3:
                return None
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if not w or not h or depth != 8 or interlace != 0 or not idat:
        return None
    if ctype not in _PNG_CHANNELS or (ctype == 3 and palette is None):
        return None
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    if len(raw) != h * (1 + stride):
        return None
    img = _png_unfilter(np.frombuffer(raw, dtype=np.uint8), h, stride, ch)
    if img is None:
        return None
    img = img.reshape(h, w, ch)
    if ctype == 0:  # gray
        return np.repeat(img, 3, axis=2).copy()
    if ctype == 2:  # rgb
        return img.copy()
    if ctype == 3:  # palette
        return palette[img[:, :, 0]].copy()
    if ctype == 4:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2).copy()
    return img[:, :, :3].copy()  # rgba -> rgb


# JPEG zigzag scan order: zigzag index -> linear index into the 8x8 block
_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); the inverse
# transform of a coefficient block F is A.T @ F @ A
_JPEG_IDCT_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _JpegBitReader:
    """MSB-first bit reader over a de-stuffed entropy-coded segment."""

    __slots__ = ("d", "i", "bit")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.i >= len(self.d):
            raise EOFError
        b = (self.d[self.i] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.i += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _jpeg_huff_table(counts: bytes, symbols: bytes) -> dict:
    """Canonical JPEG Huffman table: (code length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _jpeg_extend(v: int, s: int) -> int:
    """DC/AC value from its s magnitude bits (T.81 RECEIVE/EXTEND)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Real decoder for baseline sequential JPEG (SOF0, 8-bit, Huffman):
    pure python/numpy — marker walk, canonical Huffman entropy decode,
    dequantize, zigzag, float IDCT (8x8 DCT basis matmul), nearest
    chroma upsample, JFIF YCbCr->RGB. Supports 1- and 3-component scans,
    sampling factors 1-2 per axis, restart intervals. Returns (h, w, 3)
    uint8 RGB or None for anything else (progressive SOF2, arithmetic
    coding, 12-bit, truncated or corrupt streams).

    Bit-level work is a per-symbol python loop — sized for QC-scale
    thumbnails; a production deployment slots PIL/libjpeg above this
    fallback. (No reference analogue — multimodal brief.)"""
    try:
        return _decode_jpeg_inner(payload)
    except (EOFError, ValueError, KeyError, IndexError, ZeroDivisionError):
        return None


def _decode_jpeg_inner(payload: bytes) -> np.ndarray | None:
    if payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps = None  # list of (cid, h, v, tq)
    w = h = None
    restart_interval = 0
    pos = 2
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT (tables concatenated)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    return None  # 8-bit tables only
                qt[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.float64)
                i += 65
        elif marker == 0xC4:  # DHT (tables concatenated)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = body[i + 1 : i + 17]
                n = sum(counts)
                huff[(tc, th)] = _jpeg_huff_table(
                    counts, body[i + 17 : i + 17 + n]
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS: header then entropy data to EOI
            ns = body[0]
            scan_tabs = {}
            for c in range(ns):
                cs, t = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs[cs] = (t >> 4, t & 0xF)
            data_start = pos + 2 + seglen
            scan = (scan_tabs, payload[data_start:])
            break
        pos += 2 + seglen
    if scan is None or comps is None or not w or not h:
        return None
    scan_tabs, raw = scan

    # de-stuff and split on restart markers; stop at EOI/any other marker
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next segment
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))

    pred = {cid: 0 for cid, *_ in comps}
    interval_idx = 0
    reader = _JpegBitReader(intervals[0])
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    return None
                reader = _JpegBitReader(intervals[interval_idx])
                pred = {cid: 0 for cid, *_ in comps}
            for cid, ch, cv, tq in comps:
                dc_tab = huff.get((0, scan_tabs[cid][0]))
                ac_tab = huff.get((1, scan_tabs[cid][1]))
                q = qt.get(tq)
                if dc_tab is None or ac_tab is None or q is None:
                    return None
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64)
                        s = reader.read_huff(dc_tab)
                        pred[cid] += _jpeg_extend(reader.read_bits(s), s)
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.read_huff(ac_tab)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            zz[k] = _jpeg_extend(reader.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64)
                        coef[_JPEG_ZIGZAG] = zz * q
                        block = (
                            _JPEG_IDCT_A.T @ coef.reshape(8, 8) @ _JPEG_IDCT_A
                        ) + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1

    # upsample to full MCU grid resolution, crop to (h, w)
    full = {}
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full[cid] = p[:h, :w]
    if len(comps) == 1:
        g = np.clip(np.rint(full[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = (full[c[0]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Real decoder for PCM WAV (16-bit LE, any channel count): RIFF chunk
    walk, pure numpy. Returns (sample_rate, samples[int16, frames x ch])
    or None if not such a WAV."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, n_ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt " and len(body) >= 16:
            fmt = int.from_bytes(body[0:2], "little")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1:  # PCM only
                return None
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if rate is None or data is None or bits != 16 or not n_ch:
        return None
    frames = len(data) // (2 * n_ch)
    samples = np.frombuffer(data[: frames * 2 * n_ch], dtype="<i2")
    return rate, samples.reshape(frames, n_ch).copy()


def _decode_image_kernel(
    payload: bytes, width: int, height: int, on_undecodable: str = "error"
) -> tuple[np.ndarray | None, bool]:
    """Image decode: REAL pure-numpy decoders — binary PPM/P6 and 24-bit
    BI_RGB BMP (uncompressed containers) plus non-interlaced 8-bit PNG
    (zlib inflate + scanline unfilter; gray/GA/RGB/RGBA/palette).
    Returns (pixels, decode_ok). Payloads no real decoder claims follow
    ``on_undecodable``: "error" raises (default — a codec gap must fail
    loud), "null" returns (None, False), "fake" returns the deterministic
    arithmetic pixel field with decode_ok=False (fixtures/oracles only;
    the fake derives from payload length and dimensions so the whole
    decode->pool path keeps an exact SQL twin: the `multimodal_features`
    DuckDB oracle replays pixel = (seed + 31r + 7c + 13ch) mod 256 and
    the band means). Remaining compressed formats (JPEG/MP3) would slot
    in here via PIL/torchaudio and return decode_ok=True."""
    img = decode_ppm(payload)
    if img is None:
        img = decode_bmp(payload)
    if img is None:
        img = decode_png(payload)
    if img is None:
        img = decode_jpeg(payload)
    if img is not None:
        return img, True
    if on_undecodable == "error":
        raise NotImplementedError(
            "undecodable image payload (progressive JPEG or other exotic "
            "container? install PIL here); pass on_undecodable='null' to "
            "emit NULL features with decode_ok=false instead"
        )
    if on_undecodable == "null":
        return None, False
    h, w = (height or 4), (width or 4)
    seed = (len(payload) * 2654435761 + w * 97 + h * 31) % 2147483647
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(3)[None, None, :]
    return ((seed + 31 * r + 7 * c + 13 * ch) % 256).astype(np.uint8), False


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_dim: int = 8,
    on_undecodable: str = "error",
) -> DataFrame:
    """Decode -> pooled feature vector, batched via mapInPandas.

    Output schema: input columns (minus payload, which is pruned as early
    as possible) + feature array<float> + decode_ok boolean (true = a real
    decoder produced the pixels; false = fallback per ``on_undecodable``;
    NULL = NULL payload). ``on_undecodable`` (see _UNDECODABLE_POLICIES)
    defaults to "error": an undecodable payload fails the job rather than
    silently producing wrong features."""
    if on_undecodable not in _UNDECODABLE_POLICIES:
        raise ValueError(f"on_undecodable must be one of {_UNDECODABLE_POLICIES}")
    out_fields = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(
        out_fields
        + [
            T.StructField("feature", T.ArrayType(T.FloatType())),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )
    names = [f.name for f in out_fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, w, h in zip(
                pdf[payload_col], pdf.get("width"), pdf.get("height")
            ):
                if payload is None:
                    feats.append(None)
                    oks.append(None)
                    continue
                img, ok = _decode_image_kernel(
                    bytes(payload), int(w or 0), int(h or 0), on_undecodable
                )
                oks.append(ok)
                if img is None:  # "null" policy fallback
                    feats.append(None)
                    continue
                # mean-pool rows into out_dim horizontal bands (stand-in for
                # a real embedding model; deterministic). Integer sums are
                # exact in float64 regardless of summation order, so the
                # band mean is bit-identical to the SQL oracle's
                # sum/count/255 before the float32 narrowing.
                bands = np.array_split(img, out_dim, axis=0)
                feats.append(
                    np.array(
                        [float(b.mean(dtype=np.float64)) / 255.0 for b in bands],
                        dtype=np.float32,
                    )
                )
            out = pdf[names].copy()
            out["feature"] = feats
            out["decode_ok"] = pd.array(oks, dtype="boolean")
            yield out

    return df.mapInPandas(gen, schema=schema)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """PCM-WAV decode -> (decoded_rate, n_frames, rms, zero_cross_rate),
    batched via mapInPandas. Payloads that aren't PCM WAV yield NULLs —
    a compressed-audio decoder (torchaudio/ffmpeg) would slot into
    decode_wav the way PIL slots into the image kernel."""
    out_fields = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(
        out_fields
        + [
            T.StructField("decoded_rate", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_cross_rate", T.DoubleType()),
        ]
    )
    names = [f.name for f in out_fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, frames, rmss, zcrs = [], [], [], []
            for payload in pdf[payload_col]:
                decoded = decode_wav(bytes(payload)) if payload is not None else None
                if decoded is None:
                    rates.append(None), frames.append(None)
                    rmss.append(None), zcrs.append(None)
                    continue
                rate, samples = decoded
                mono = samples.mean(axis=1)
                n = len(mono)
                rates.append(rate)
                frames.append(n)
                rmss.append(float(np.sqrt(np.mean(mono**2))) if n else None)
                zcrs.append(
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1
                    else None
                )
            out = pdf[names].copy()
            out["decoded_rate"] = pd.array(rates, dtype="Int32")
            out["n_frames"] = pd.array(frames, dtype="Int64")
            out["rms"] = pd.array(rmss, dtype="Float64")
            out["zero_cross_rate"] = pd.array(zcrs, dtype="Float64")
            yield out

    return df.mapInPandas(gen, schema=schema)


def frame_sample(
    df: DataFrame,
    every_s: float = 1.0,
    payload_col: str = "payload",
    duration_col: str = "duration_s",
) -> DataFrame:
    """Video -> one row per sampled frame timestamp (explode is JVM-side;
    actual frame decode is the stubbed kernel's job downstream)."""
    n_frames = F.greatest(
        (F.col(duration_col) / F.lit(float(every_s))).cast("int"), F.lit(1)
    )
    ts = F.transform(
        F.sequence(F.lit(0), n_frames - 1), lambda i: i * F.lit(float(every_s))
    )
    return df.withColumn("frame_ts", F.explode(ts))


def resize_spec(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Compute target (width, height) preserving aspect ratio — pure expr;
    the actual resample happens in the decode kernel."""
    scale = F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height"))
    clamped = F.least(scale, F.lit(1.0))
    return df.withColumn(
        "target_width", F.ceil(F.col("width") * clamped).cast("int")
    ).withColumn("target_height", F.ceil(F.col("height") * clamped).cast("int"))


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                mt = ("image", "audio", "video")[int(i) % 3]
                rows.append(
                    {
                        "media_id": int(i),
                        "media_type": mt,
                        "payload": rng.bytes(64),
                        "width": int(rng.integers(16, 64)) if mt != "audio" else None,
                        "height": int(rng.integers(16, 64)) if mt != "audio" else None,
                        "duration_s": float(rng.uniform(1, 10)) if mt != "image" else None,
                        "sample_rate": 16000 if mt == "audio" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=max(4, n // 10_000)).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )
