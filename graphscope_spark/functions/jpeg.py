"""Pure-Python (stdlib + numpy) baseline JPEG and PNG codecs — the
production-codec swap-in for `multimodal._decode_payload`'s flagged
fallback, implementable in-sandbox because both formats are fully
public specs (ITU-T T.81 / ISO 10918-1 Annex K tables, RFC 2083) and
need nothing beyond numpy (DCT as an 8×8 matrix product) and zlib.

Scope (honest bounds, each guarded with a ValueError):
- JPEG decode: baseline sequential DCT (SOF0), 8-bit, grayscale or
  YCbCr, ARBITRARY Huffman/quant tables read from the stream,
  arbitrary chroma sampling factors (2x2/2x1/1x1 — nearest-neighbor
  upsample), restart markers. Progressive (SOF2), arithmetic coding,
  and 12-bit are rejected loudly.
- JPEG encode: baseline 4:4:4 (or grayscale), Annex K quant tables
  scaled by the libjpeg quality curve, Annex K Huffman tables —
  emitted in DHT/DQT, so any spec decoder reads them back.
- PNG decode: 8-bit greyscale/RGB/RGBA (+alpha dropped to RGB), all
  five scanline filters, non-interlaced.  PNG encode: 8-bit RGB,
  filter 0.

Entropy coding is per-block sequential Python — fine for the
test-scale corpora this sandbox processes; the mapInPandas plumbing
around it (schema, batching, payload pruning) is the part that must
survive 100 TB, and is unchanged.

Reference parity note: GraphScope itself delegates image decode to
external libs (vineyard/GAE don't ship a codec); this module exists
to close the multimodal pipeline's decode stub with a real, tested
implementation rather than a deterministic fake.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------
# shared JPEG constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16], huffval)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

for _b, _v in ((DC_LUM_BITS, DC_LUM_VALS), (DC_CHROM_BITS, DC_CHROM_VALS),
               (AC_LUM_BITS, AC_LUM_VALS), (AC_CHROM_BITS, AC_CHROM_VALS)):
    assert sum(_b) == len(_v), "corrupt Huffman spec"

# orthonormal 8x8 DCT-II basis: C[u, x] = c(u) cos((2x+1)uπ/16)
_DCT = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _DCT[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(0.125) if _u == 0 else 0.5
        )


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 5000/q below 50, 200-2q above."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int64)


def _huff_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG code assignment."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    enc = _huff_encode_table(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., 0].astype(np.float64),
               img[..., 1].astype(np.float64),
               img[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG category (size) + amplitude bits (1's complement for
    negatives)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(
    bw: _BitWriter, blocks: np.ndarray, dc_tab, ac_tab, pred: int
) -> int:
    """blocks: (n, 64) zigzagged quantized ints; returns new DC pred."""
    for zz in blocks:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        size, bits = _magnitude(diff)
        code, ln = dc_tab[size]
        bw.write(code, ln)
        if size:
            bw.write(bits, size)
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_tab[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            size, bits = _magnitude(v)
            code, ln = ac_tab[(run << 4) | size]
            bw.write(code, ln)
            bw.write(bits, size)
            run = 0
        if last < 63:
            code, ln = ac_tab[0x00]  # EOB
            bw.write(code, ln)
    return pred


def _component_blocks(
    plane: np.ndarray, q: np.ndarray, mult: int = 8
) -> np.ndarray:
    """Plane (H, W) float -> (bh, bw, 64) quantized zigzag ints on a
    block grid, edge-replicated to `mult`-multiples (16 for the 4:2:0
    luma plane so every MCU has its full 2x2 block quad)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, -h % mult), (0, -w % mult)), mode="edge") - 128.0
    bh, bw_ = p.shape[0] // 8, p.shape[1] // 8
    out = np.zeros((bh, bw_, 64), dtype=np.int64)
    qm = q.reshape(8, 8).astype(np.float64)
    for by in range(bh):
        for bx in range(bw_):
            coef = _dct2(p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8])
            out[by, bx] = np.round(coef / qm).astype(np.int64).ravel()[ZIGZAG]
    return out


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "4:4:4"
) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale) -> baseline JFIF JPEG,
    4:4:4 or 4:2:0 (2x2 luma sampling, chroma mean-downsampled)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"subsampling must be 4:4:4|4:2:0, got {subsampling!r}")
    img = np.asarray(img)
    gray = img.ndim == 2
    sub420 = subsampling == "4:2:0" and not gray
    h, w = img.shape[:2]
    qlum = _quality_scale(QUANT_LUM, quality)
    qchrom = _quality_scale(QUANT_CHROM, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")  # APP0
    # DQT (zigzag order on the wire)
    for tq, q in ([(0, qlum)] if gray else [(0, qlum), (1, qchrom)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(q[zi]) for zi in ZIGZAG)
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hv = 0x22 if (sub420 and cid == 1) else 0x11
        out += bytes([cid, hv, 0 if cid == 1 else 1])
    # DHT
    specs = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if not gray:
        specs += [(0x01, DC_CHROM_BITS, DC_CHROM_VALS),
                  (0x11, AC_CHROM_BITS, AC_CHROM_VALS)]
    for tc_th, bits, vals in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += bytes([cid, 0x00 if cid == 1 else 0x11])
    out += b"\x00\x3f\x00"

    dcl = _huff_encode_table(DC_LUM_BITS, DC_LUM_VALS)
    acl = _huff_encode_table(AC_LUM_BITS, AC_LUM_VALS)
    if gray:
        planes = [img.astype(np.float64)]
        qs = [qlum]
        tabs = [(dcl, acl)]
    else:
        ycc = _rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if sub420:
            # mean-downsample chroma 2x2 (pad odd dims by edge first)
            cpad = ((0, h % 2), (0, w % 2))
            cb = np.pad(cb, cpad, mode="edge")
            cr = np.pad(cr, cpad, mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(
                axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(
                axis=(1, 3))
        planes = [y, cb, cr]
        qs = [qlum, qchrom, qchrom]
        dcc = _huff_encode_table(DC_CHROM_BITS, DC_CHROM_VALS)
        acc = _huff_encode_table(AC_CHROM_BITS, AC_CHROM_VALS)
        tabs = [(dcl, acl), (dcc, acc), (dcc, acc)]

    lum_mult = 16 if sub420 else 8
    comp_blocks = [
        _component_blocks(p, q, lum_mult if ci == 0 else 8)
        for ci, (p, q) in enumerate(zip(planes, qs))
    ]
    hs = [2 if (sub420 and ci == 0) else 1 for ci in range(len(planes))]
    mcuy = comp_blocks[0].shape[0] // hs[0]
    mcux = comp_blocks[0].shape[1] // hs[0]
    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(len(planes)):
                s = hs[c]
                for by in range(s):
                    for bx in range(s):
                        blk = comp_blocks[c][my * s + by, mx * s + bx]
                        preds[c] = _encode_blocks(
                            bw, blk[None, :], tabs[c][0], tabs[c][1], preds[c]
                        )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------


class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing; RST markers are
    consumed by the caller via `restart()`."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.d[self.p]
        if b == 0xFF:
            nxt = self.d[self.p + 1]
            if nxt == 0x00:
                self.p += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                # marker after the scan (e.g. EOI): spec says pad — feed 0s
                self.acc = (self.acc << 8)
                self.n += 8
                return
        else:
            self.p += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and byte-align."""
        self.acc = 0
        self.n = 0
        assert self.d[self.p] == 0xFF and 0xD0 <= self.d[self.p + 1] <= 0xD7
        self.p += 2


class _RestartPending(Exception):
    pass


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _huff_read(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> HxWx3 uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    p = 2
    while p < len(payload):
        if payload[p] != 0xFF:
            raise ValueError("marker expected")
        m = payload[p + 1]
        p += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue
        ln = struct.unpack_from(">H", payload, p)[0]
        seg = payload[p + 2:p + ln]
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i:i + n]
                vals = (np.frombuffer(raw, dtype=">u2").astype(np.int64)
                        if pq else
                        np.frombuffer(raw, dtype=np.uint8).astype(np.int64))
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = vals  # wire order is zigzag
                qt[tq] = tbl
                i += n
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif m in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF marker 0xFF{m:02X}) — "
                "only baseline sequential (SOF0/SOF1) is implemented"
            )
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            return _decode_scan(
                payload, p + ln, frame, scan, qt, huff, restart_interval
            )
        p += ln
    raise ValueError("no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c, _, _ in scan:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    preds = [0] * len(scan)
    br = _BitReader(data, pos)
    qms = [qt[c["tq"]].reshape(8, 8).astype(np.float64) for c, _, _ in scan]
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                try:
                    br.bit()  # force any pending marker to surface
                    raise ValueError("expected restart marker")
                except _RestartPending:
                    br.restart()
                    preds = [0] * len(scan)
            n_mcu += 1
            for ci, (c, td, ta) in enumerate(scan):
                dct_tab = huff[(0, td)]
                act_tab = huff[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = _huff_read(br, dct_tab)
                        diff = _extend(br.bits(size), size)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_read(br, act_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        block = _idct2(coef.reshape(8, 8) * qms[ci]) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    # upsample each component to full MCU-grid resolution, crop, stack
    full = []
    for ci, (c, _, _) in enumerate(scan):
        p_ = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p_ = np.repeat(np.repeat(p_, ry, axis=0), rx, axis=1)
        full.append(p_[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(full) == 3:
        return _ycbcr_to_rgb(np.stack(full, axis=-1))
    raise ValueError(f"unsupported component count {len(full)}")


# ---------------------------------------------------------------------
# PNG (RFC 2083): zlib is stdlib, filters are simple recurrences
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> non-interlaced 8-bit PNG, filter 0."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit greyscale/RGB/RGBA non-interlaced PNG -> HxWx3 uint8 RGB
    (alpha dropped, grey replicated)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    p = 8
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    while p < len(payload):
        ln = struct.unpack_from(">I", payload, p)[0]
        tag = payload[p + 4:p + 8]
        body = payload[p + 8:p + 8 + ln]
        p += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if f == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                c = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(a, int(prev[i]), int(c))) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = out[y]
    img = out.reshape(h, w, nch)
    if nch == 1:
        return np.repeat(img, 3, axis=-1)
    if nch == 2:
        return np.repeat(img[..., :1], 3, axis=-1)
    return img[..., :3].copy()
