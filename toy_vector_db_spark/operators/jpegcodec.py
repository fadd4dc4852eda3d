"""Baseline JPEG (ITU-T T.81) for 8-bit grayscale AND YCbCr 4:2:0
color, from scratch.

The container ships no imaging library, but baseline sequential JPEG is
public spec + numpy: 8×8 level-shifted blocks through an orthonormal
2-D DCT-II, Annex K table K.1 quantization, zigzag, DC-differential +
AC run-length coding under the standard Annex K luminance Huffman
tables, 0xFF byte stuffing, and the SOI/DQT/SOF0/DHT/SOS/EOI marker
frame. The decoder walks the markers strictly, rebuilds canonical
Huffman codes from the DHT segments it actually read (not from the
module constants — a corrupted table must fail, not silently decode),
dequantizes, inverse-DCTs, and crops the edge-replicated padding.

Color (round 14, verdict r13 item 5's second half): encode_jpeg_color /
decode_jpeg_color carry an (h, w, 3) RGB image through the full
production shape — T.871 RGB→YCbCr, 4:2:0 chroma subsampling (2×2
mean), the Annex K CHROMINANCE tables (K.2 quantization, K.4/K.6
Huffman) on Cb/Cr with per-component DC predictors inside 16×16 MCUs
(four Y blocks + Cb + Cr, interleaved per T.81 A.2.3), two DQT tables
and four DHT specs in the stream, sample-replication upsampling and
the inverse color transform on decode. The per-block coefficient
pipeline is byte-shared with the gray path (_encode_block /
_decode_block).

JPEG is LOSSY: round-trip equality is a bounded-error property, not
bit-identity, so unlike the PNG path the pixel values cannot share the
raw byte-math oracle. What IS exact and SQL-derivable is the structure
(dims from SOF0, MCU grid) and a tolerance verdict; the pixel-accuracy
bound itself is pinned by tests on smooth/flat/random images.

Everything here derives from the public standard: quantization and
Huffman constants are Annex K of T.81, the DCT is the textbook
orthonormal matrix form.
"""

from __future__ import annotations

import numpy as np

# Annex K, table K.1 — luminance quantization (quality 50).
QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K, table K.2 — chrominance quantization (quality 50).
QUANT_C = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K tables K.3 / K.5 — standard luminance Huffman specs
# (BITS: code count per length 1..16; HUFFVAL: symbols in code order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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


# Annex K tables K.4 / K.6 — standard CHROMINANCE Huffman specs.
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
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


def _zigzag_order() -> list[tuple[int, int]]:
    """The 64-entry zigzag scan: diagonals of constant i+j, direction
    alternating (odd sums walk down-left, even sums up-right)."""
    out = []
    for s in range(15):
        ij = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        out.extend(ij if s % 2 else ij[::-1])
    return out


ZIGZAG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    C *= np.sqrt(2.0 / 8.0)
    C[0] *= np.sqrt(0.5)
    return C


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical Huffman assignment (T.81 C.2)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)
_DC_ENC_C = _canonical_codes(DC_BITS_C, DC_VALS_C)
_AC_ENC_C = _canonical_codes(AC_BITS_C, AC_VALS_C)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
        # drop already-emitted high bits: without this the accumulator
        # grows to the full entropy-stream length and every shift above
        # goes O(stream) — quadratic per image (advice r8 item 2)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amp_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


_ZZ_R = np.array([p[0] for p in ZIGZAG])
_ZZ_C = np.array([p[1] for p in ZIGZAG])


def _encode_block(
    bw: "_BitWriter",
    blk: np.ndarray,
    quant: np.ndarray,
    dc_enc: dict,
    ac_enc: dict,
    prev_dc: int,
) -> int:
    """One 8×8 sample block through DCT → quantize → zigzag → DC-diff +
    AC run-length entropy coding under the given tables (T.81 F.1.2);
    returns this block's DC for the caller's per-component predictor.
    Shared verbatim by the grayscale path and every color component —
    only the tables differ."""
    coef = _DCT @ (blk - 128.0) @ _DCT.T
    q = np.floor(coef / quant + 0.5).astype(np.int64)
    zz = q[_ZZ_R, _ZZ_C]
    dc = int(zz[0])
    diff = dc - prev_dc
    s = _category(diff)
    code, ln = dc_enc[s]
    bw.write(code, ln)
    if s:
        bw.write(_amp_bits(diff, s), s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            break
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(_amp_bits(v, s), s)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg(img: np.ndarray) -> bytes:
    """Baseline-JPEG encode of an (h, w, 1) uint8 grayscale image.
    Dims pad to multiples of 8 by edge replication (decoder crops via
    the SOF0 dims). Deterministic: fixed tables, integer quantization
    via floor(x + 0.5) = round-half-UP toward +infinity (-2.5 → -2; not
    np.rint's half-even, not half-away — T.81 leaves the rule free, the
    decoder is table-driven either way, pinned by tests)."""
    h, w, c = img.shape
    if c != 1 or h < 1 or w < 1 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"JPEG encoder handles non-empty gray images, got {img.shape}")
    gray = img[:, :, 0].astype(np.float64)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(gray, ((0, ph - h), (0, pw - w)), mode="edge")

    bw = _BitWriter()
    prev_dc = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            prev_dc = _encode_block(
                bw,
                padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8],
                QUANT,
                _DC_ENC,
                _AC_ENC,
                prev_dc,
            )

    qt_zz = bytes(int(QUANT[r, cc]) for r, cc in ZIGZAG)
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xDB, b"\x00" + qt_zz)  # DQT (Pq=0, Tq=0)
        + _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))  # SOF0: 1 component, no subsampling
        + _seg(0xC4, dht)  # DHT (DC class 0 + AC class 1, both id 0)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
        + bw.flush()
        + b"\xff\xd9"  # EOI
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside entropy data")
            self.pos += 1  # skip the stuffed 0x00
        self._acc = (self._acc << 8) | b
        self._n += 8

    def _trim(self) -> None:
        # mask consumed high bits so _acc stays ≤ _n bits wide; an
        # ever-growing accumulator makes each shift O(consumed stream)
        # — quadratic per image (advice r8 item 2)
        self._acc &= (1 << self._n) - 1

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        v = (self._acc >> self._n) & 1
        self._trim()
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_tables(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, built from a DHT segment's spec. Strict:
    a count/value mismatch or a code overflowing its bit length means a
    corrupt table and must be a typed error, not an IndexError."""
    if sum(bits) != len(vals):
        raise ValueError(
            f"DHT spec claims {sum(bits)} codes but carries {len(vals)} values"
        )
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError(f"DHT code overflow at length {length}")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    br: "_BitReader",
    dc_tab: dict,
    ac_tab: dict,
    quant: np.ndarray,
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """One entropy-coded 8×8 block → (pixel block, updated DC
    predictor): Huffman-decode DC diff + AC runs, dequantize through
    the given table, inverse-DCT, level-unshift (T.81 F.2.1-F.2.2).
    Shared verbatim by the grayscale path and every color component."""
    zz = np.zeros(64, dtype=np.int64)
    s = _read_symbol(br, dc_tab)
    diff = _extend(br.bits(s), s) if s else 0
    prev_dc += diff
    zz[0] = prev_dc
    i = 1
    while i < 64:
        sym = _read_symbol(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError(f"bad AC symbol {sym:#x}")
            i += 16  # ZRL
            if i > 63:
                # a conforming encoder emits ZRL only with a nonzero
                # coefficient still ahead in the block
                raise ValueError("ZRL past block end")
            continue
        i += run
        if i > 63:
            raise ValueError("AC run past block end")
        zz[i] = _extend(br.bits(size), size)
        i += 1
    blk = np.zeros((8, 8), dtype=np.float64)
    blk[_ZZ_R, _ZZ_C] = zz * quant[_ZZ_R, _ZZ_C]
    return _DCT.T @ blk @ _DCT + 128.0, prev_dc


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-JPEG decode of the grayscale subset the encoder emits.
    Strict: markers, table ids, component layout, and stream validity
    all fail loudly. Tables come from the DHT/DQT segments in the file."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"bad JPEG SOI: {payload[:2]!r}")
    pos = 2
    quant = None
    dc_tab = ac_tab = None
    h = w = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG has no scan data")
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        seg = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            if seg[0] != 0x00:
                raise ValueError("only 8-bit quant table 0 supported")
            q = np.zeros((8, 8), dtype=np.int32)
            for idx, (r, cc) in enumerate(ZIGZAG):
                q[r, cc] = seg[1 + idx]
            quant = q
        elif marker == 0xC0:
            if seg[0] != 8 or seg[5] != 1:
                raise ValueError("only 8-bit single-component SOF0 supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            if seg[7] != 0x11:
                raise ValueError("subsampled JPEG not supported")
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1:off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17:off + 17 + nv])
                tab = _decode_tables(bits, vals)
                if tc_th == 0x00:
                    dc_tab = tab
                elif tc_th == 0x10:
                    ac_tab = tab
                else:
                    raise ValueError(f"unsupported DHT id {tc_th:#x}")
                off += 17 + nv
        elif marker == 0xDA:
            if seg[:2] != bytes([1, 1]) or seg[2] != 0x00:
                raise ValueError("unsupported SOS layout")
            pos = pos + 2 + ln
            break
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError(f"non-baseline SOF marker {marker:#x}")
        pos = pos + 2 + ln
    if quant is None or dc_tab is None or ac_tab is None or h is None:
        raise ValueError("JPEG missing DQT/DHT/SOF0 before SOS")
    if payload[-2:] != b"\xff\xd9":
        raise ValueError("JPEG missing EOI")

    br = _BitReader(payload[pos:-2])
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.zeros((ph, pw), dtype=np.float64)
    prev_dc = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            pix, prev_dc = _decode_block(br, dc_tab, ac_tab, quant, prev_dc)
            out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = pix
    clipped = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return clipped[:h, :w].reshape(h, w, 1)


# --- YCbCr 4:2:0 color (round 14) ------------------------------------------


def _rgb_to_ycbcr(
    rgb: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-range RGB → YCbCr per ITU-T T.871 §7 (the JFIF convention
    baseline JPEG interchange assumes); float64, no rounding — the
    planes go straight into the DCT."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def encode_jpeg_color(img: np.ndarray) -> bytes:
    """Baseline-JPEG encode of an (h, w, 3) uint8 RGB image as YCbCr
    4:2:0 — the production color shape: Y at full resolution under the
    K.1 luminance tables, Cb/Cr subsampled 2×2 (mean) under the K.2
    quantization and K.4/K.6 Huffman chrominance tables, interleaved as
    16×16 MCUs (4 Y blocks + Cb + Cr, T.81 A.2.3) with per-component
    DC predictors. Dims pad to multiples of 16 by edge replication
    (decoder crops via the SOF0 dims). Deterministic end to end: fixed
    tables, the shared floor(x+0.5) quantizer, exact-mean subsampling."""
    h, w, c = img.shape
    if c != 3 or h < 1 or w < 1 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(
            f"color JPEG encoder handles non-empty RGB images, got {img.shape}"
        )
    y, cb, cr = _rgb_to_ycbcr(img)
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    pad = ((0, ph - h), (0, pw - w))
    y = np.pad(y, pad, mode="edge")
    cb = np.pad(cb, pad, mode="edge")
    cr = np.pad(cr, pad, mode="edge")
    # 4:2:0 — each chroma sample is the mean of its 2×2 pixel group
    cb_s = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr_s = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    bw = _BitWriter()
    dc_y = dc_cb = dc_cr = 0
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for by in range(2):
                for bx in range(2):
                    r0 = my * 16 + by * 8
                    c0 = mx * 16 + bx * 8
                    dc_y = _encode_block(
                        bw, y[r0:r0 + 8, c0:c0 + 8], QUANT,
                        _DC_ENC, _AC_ENC, dc_y,
                    )
            r0, c0 = my * 8, mx * 8
            dc_cb = _encode_block(
                bw, cb_s[r0:r0 + 8, c0:c0 + 8], QUANT_C,
                _DC_ENC_C, _AC_ENC_C, dc_cb,
            )
            dc_cr = _encode_block(
                bw, cr_s[r0:r0 + 8, c0:c0 + 8], QUANT_C,
                _DC_ENC_C, _AC_ENC_C, dc_cr,
            )
    qt = (
        b"\x00" + bytes(int(QUANT[r, cc]) for r, cc in ZIGZAG)
        + b"\x01" + bytes(int(QUANT_C[r, cc]) for r, cc in ZIGZAG)
    )
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
        + bytes([0x01]) + bytes(DC_BITS_C) + bytes(DC_VALS_C)
        + bytes([0x11]) + bytes(AC_BITS_C) + bytes(AC_VALS_C)
    )
    sof = (
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    )
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xDB, qt)  # DQT: luminance table 0 + chrominance table 1
        + _seg(0xC0, sof)  # SOF0: Y 2x2 sampling, Cb/Cr 1x1
        + _seg(0xC4, dht)  # DHT: four specs (DC/AC x luma/chroma)
        + _seg(0xDA, sos)
        + bw.flush()
        + b"\xff\xd9"  # EOI
    )


def decode_jpeg_color(payload: bytes) -> np.ndarray:
    """Baseline-JPEG decode of the YCbCr 4:2:0 subset the color encoder
    emits. Strict like the gray path: markers, table classes/ids,
    sampling factors, component layout, and stream validity all fail
    loudly; quantization and Huffman tables come from the file's own
    DQT/DHT segments. Chroma upsamples by sample replication, then the
    T.871 inverse transform, floor(x+0.5) and clip to uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"bad JPEG SOI: {payload[:2]!r}")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    h = w = None
    comp_spec = None
    sel = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG has no scan data")
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        seg = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            off = 0
            while off + 65 <= len(seg) + 1:
                if off >= len(seg):
                    break
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0 or tq > 3:
                    raise ValueError("only 8-bit quant tables supported")
                q = np.zeros((8, 8), dtype=np.int32)
                for idx, (r, cc) in enumerate(ZIGZAG):
                    q[r, cc] = seg[off + 1 + idx]
                quants[tq] = q
                off += 65
        elif marker == 0xC0:
            if seg[0] != 8 or seg[5] != 3:
                raise ValueError("expected 8-bit 3-component SOF0")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            comp_spec = [
                (seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i])
                for i in range(3)
            ]
            if [cs[1] for cs in comp_spec] != [0x22, 0x11, 0x11]:
                raise ValueError("only 4:2:0 YCbCr sampling supported")
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1:off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17:off + 17 + nv])
                tab = _decode_tables(bits, vals)
                if tc == 0:
                    dc_tabs[th] = tab
                elif tc == 1:
                    ac_tabs[th] = tab
                else:
                    raise ValueError(f"unsupported DHT class {tc}")
                off += 17 + nv
        elif marker == 0xDA:
            if seg[0] != 3:
                raise ValueError("expected 3-component SOS")
            sel = [(seg[1 + 2 * i], seg[2 + 2 * i]) for i in range(3)]
            pos = pos + 2 + ln
            break
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise ValueError(f"non-baseline SOF marker {marker:#x}")
        pos = pos + 2 + ln
    if (
        h is None or comp_spec is None or sel is None
        or not quants or not dc_tabs or not ac_tabs
    ):
        raise ValueError("JPEG missing DQT/DHT/SOF0 before SOS")
    if payload[-2:] != b"\xff\xd9":
        raise ValueError("JPEG missing EOI")
    br = _BitReader(payload[pos:-2])
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    y = np.zeros((ph, pw), dtype=np.float64)
    cbp = np.zeros((ph // 2, pw // 2), dtype=np.float64)
    crp = np.zeros((ph // 2, pw // 2), dtype=np.float64)
    tsel = {s[0]: (s[1] >> 4, s[1] & 0x0F) for s in sel}
    qsel = {cs[0]: cs[2] for cs in comp_spec}
    prev = {1: 0, 2: 0, 3: 0}
    for cid in (1, 2, 3):
        if cid not in tsel or qsel.get(cid) not in quants:
            raise ValueError("SOS/SOF component tables incomplete")
        dcs, acs = tsel[cid]
        if dcs not in dc_tabs or acs not in ac_tabs:
            raise ValueError("SOS selects a missing Huffman table")
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for by in range(2):
                for bx in range(2):
                    dcs, acs = tsel[1]
                    pix, prev[1] = _decode_block(
                        br, dc_tabs[dcs], ac_tabs[acs],
                        quants[qsel[1]], prev[1],
                    )
                    r0 = my * 16 + by * 8
                    c0 = mx * 16 + bx * 8
                    y[r0:r0 + 8, c0:c0 + 8] = pix
            for cid, plane in ((2, cbp), (3, crp)):
                dcs, acs = tsel[cid]
                pix, prev[cid] = _decode_block(
                    br, dc_tabs[dcs], ac_tabs[acs],
                    quants[qsel[cid]], prev[cid],
                )
                plane[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = pix
    cb = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1) - 128.0
    cr = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    out = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return out[:h, :w]
