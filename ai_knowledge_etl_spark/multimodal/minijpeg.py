"""Minimal pure-Python/numpy baseline JPEG codec (public JPEG spec,
ITU-T T.81 + JFIF 1.02): enough to run the REAL lossy quality ladder of
the image-compression chain in a container without an imaging library
(round-7 verdict #4; the PNG-only minipng backend exercised the tier
walk on real bytes but losslessly, so byte sizes never actually shrank
with the tier).

Scope, deliberately tiny and fully deterministic:
  - encode: 8-bit RGB → baseline sequential JFIF. 4:4:4 (no chroma
    subsampling), standard Annex-K quantization tables scaled by the
    libjpeg quality formula, standard Annex-K Huffman tables (never
    optimized ones), orthonormal float DCT with half-away-from-zero
    rounding → identical bytes on every platform/numpy version that
    implements IEEE-754 doubles (verified by the differential: the
    oracle's expected sizes are computed in the driver, the bytes in
    the executors).
  - decode: exactly the subset the encoder emits (baseline, 3
    components, 4:4:4, 8-bit) — raises on anything else. Real
    deployments drop in PIL; this decoder exists so tests can
    round-trip the ladder's output in-container.

Reference anchor: scripts/compress-image.mjs:49-97 (sharp resize →
jpeg q80 fallback chain) — this module supplies the "jpeg" half the
container lacked.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"\xff\xd8\xff"

# Annex K.1 / K.2 base quantization tables (natural, row-major order)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag scan order: _ZIG[k] = flat index (row*8+col) of the k-th
# zigzag coefficient
_ZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 standard Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code assignment: value → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = (_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA))
_ENC_AC = (_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA))


def _enc_arrays(tab: dict[int, tuple[int, int]]) -> tuple[np.ndarray, np.ndarray]:
    """Dict Huffman table → (code, length) int64 lookup arrays, indexable
    by the run/size symbol — the vectorized encoder's form."""
    code = np.zeros(256, dtype=np.int64)
    ln = np.zeros(256, dtype=np.int64)
    for sym, (c, l) in tab.items():
        code[sym] = c
        ln[sym] = l
    return code, ln


_ENC_DCA = tuple(_enc_arrays(t) for t in _ENC_DC)
_ENC_ACA = tuple(_enc_arrays(t) for t in _ENC_AC)

# |value| → JPEG magnitude category (bit_length), vectorized LUT. 2^15
# covers every baseline coefficient (|DC diff| ≤ 2048, |AC| ≤ ~1024);
# encode_jpeg asserts the bound before indexing.
_SIZE_LUT = np.zeros(1 << 15, dtype=np.int64)
for _v in range(1, 1 << 15):
    _SIZE_LUT[_v] = _v.bit_length()

# orthonormal 8-point DCT-II basis matrix
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K tables (public formula)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qy = np.clip((_QY * scale + 50) // 100, 1, 255)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255)
    return qy.astype(np.int32), qc.astype(np.int32)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already level-shifted) → (n, 8, 8) blocks,
    edge-replicated to multiples of 8."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # keep only the unemitted low bits — without this mask the
        # accumulator grows into an unbounded bignum and every shift
        # goes O(total bits emitted so far)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-padding per spec


def _encode_block(
    bw: _BitWriter,
    blk: list[int],
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
    prev_dc: int,
) -> int:
    """Entropy-code one quantized zigzag block (64 plain ints). Pure-int
    hot loop — int.bit_length() is the JPEG magnitude category, and the
    numpy-free form is ~15x faster than per-coefficient array ops (this
    loop runs once per (block, component) at encode time)."""
    put = bw.put
    dc = blk[0]
    diff = dc - prev_dc
    s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
    code, ln = dc_tab[s]
    put(code, ln)
    if s:
        put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 0
    for k in range(63, 0, -1):
        if blk[k]:
            last = k
            break
    for k in range(1, last + 1):
        v = blk[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            put(code, ln)
            run -= 16
        s = v.bit_length() if v >= 0 else (-v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        put(code, ln)
        put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        put(code, ln)
    return dc


def _encode_scan_scalar(comps: list[np.ndarray]) -> bytes:
    """Reference entropy coder: the original per-coefficient Python loop
    over _encode_block/_BitWriter. Kept as the byte-equality oracle for
    the vectorized path (tests assert _encode_scan(comps) ==
    _encode_scan_scalar(comps) exactly); not on the hot path."""
    bw = _BitWriter()
    lists = [c.tolist() for c in comps]
    n = len(lists[0])
    prev_dc = [0, 0, 0]
    for i in range(n):
        for c in range(3):
            t = 0 if c == 0 else 1
            prev_dc[c] = _encode_block(
                bw, lists[c][i], _ENC_DC[t], _ENC_AC[t], prev_dc[c]
            )
    bw.flush()
    return bytes(bw.out)


def _encode_scan(comps: list[np.ndarray]) -> bytes:
    """Vectorized baseline-JPEG entropy coder (round 10): byte-identical
    to _encode_scan_scalar, ~10× faster — the scalar loop was 86 % of
    every encode (3.7M Python BitWriter.put calls per card walk,
    profiled on the pipeline-image-curate-real population).

    Strategy: build, per component, flat arrays of Huffman emissions
    (merged code+extra value, bit length) for DC diffs, ZRL runs, AC
    run/size symbols, and EOBs, each tagged with an integer sort key
    encoding (MCU, position-in-block, ZRL-ordinal); one stable argsort
    interleaves them into scan order; then a single vectorized bit-pack
    (cumsum offsets → per-bit gather → np.packbits) with 1-padding and
    0xFF 0x00 byte stuffing reproduces _BitWriter's output exactly."""
    keys, vals, lens = [], [], []
    for corder, A in enumerate(comps):
        t = 0 if corder == 0 else 1
        dccode, dclen = _ENC_DCA[t]
        accode, aclen = _ENC_ACA[t]
        n = A.shape[0]
        mcu = np.arange(n, dtype=np.int64) * 3 + corder
        # --- DC: differential, magnitude category + extra bits
        dc = A[:, 0]
        diff = np.empty(n, dtype=np.int64)
        diff[0] = dc[0]
        diff[1:] = dc[1:] - dc[:-1]
        mags = np.abs(diff)
        if mags.size and mags.max() >= _SIZE_LUT.size:
            raise ValueError("coefficient out of baseline range")
        s = _SIZE_LUT[mags]
        extra = np.where(diff >= 0, diff, diff + (1 << s) - 1)
        keys.append(mcu << 12)
        vals.append((dccode[s] << s) | extra)
        lens.append(dclen[s] + s)
        # --- AC: nonzero coefficients with zero-run bookkeeping
        mask = A[:, 1:] != 0
        bi, k0 = np.nonzero(mask)
        k = k0.astype(np.int64) + 1
        v = A[bi, k]
        prevk = np.empty_like(k)
        if k.size:
            prevk[0] = 0
            prevk[1:] = k[:-1]
            first = np.empty(k.size, dtype=bool)
            first[0] = True
            first[1:] = bi[1:] != bi[:-1]
            prevk[first] = 0
        run = k - prevk - 1
        z, frun = run >> 4, run & 15
        magv = np.abs(v)
        if magv.size and magv.max() >= _SIZE_LUT.size:
            raise ValueError("coefficient out of baseline range")
        s = _SIZE_LUT[magv]
        sym = (frun << 4) | s
        extra = np.where(v >= 0, v, v + (1 << s) - 1)
        # final run/size symbol sorts at j=15, AFTER its ZRLs (j ≤ 2)
        keys.append((bi * 3 + corder) << 12 | (k << 4) | 15)
        vals.append((accode[sym] << s) | extra)
        lens.append(aclen[sym] + s)
        # --- ZRL expansion (rare): one 0xF0 symbol per 16 skipped zeros
        zi = np.nonzero(z)[0]
        if zi.size:
            rep = z[zi]
            zid = np.repeat(zi, rep)
            j = np.arange(zid.size, dtype=np.int64) - np.repeat(
                np.cumsum(rep) - rep, rep
            )
            keys.append((bi[zid] * 3 + corder) << 12 | (k[zid] << 4) | j)
            vals.append(np.full(zid.size, accode[0xF0], dtype=np.int64))
            lens.append(np.full(zid.size, aclen[0xF0], dtype=np.int64))
        # --- EOB wherever the block's tail is zero
        lastk = np.where(
            mask.any(axis=1), 63 - np.argmax(mask[:, ::-1], axis=1), 0
        )
        eb = np.nonzero(lastk < 63)[0]
        keys.append((eb.astype(np.int64) * 3 + corder) << 12 | (64 << 4))
        vals.append(np.full(eb.size, accode[0x00], dtype=np.int64))
        lens.append(np.full(eb.size, aclen[0x00], dtype=np.int64))
    key = np.concatenate(keys)
    order = np.argsort(key, kind="stable")
    V = np.concatenate(vals)[order]
    L = np.concatenate(lens)[order]
    ends = np.cumsum(L)
    total = int(ends[-1]) if L.size else 0
    npad = (-total) % 8
    nbytes = (total + npad) // 8
    # Byte-lane accumulation (round 11, byte-identical — pinned against
    # the scalar coder by the existing property test): instead of
    # materializing one uint8 PER BIT (the dominant coder stage at
    # ~1.7M bits per noise card), place each symbol's merged code into a
    # 64-bit window anchored at its start byte and sum the five byte
    # lanes with bincount. Symbols never share a bit, so per-byte lane
    # sums are exact ORs (< 256, and < 2^53 for float64 bincount).
    # Max window: 16 huffman + 15 extra bits + 7 bit offset = 38 < 64.
    if total:
        starts = ends - L
        byte_start = starts >> 3
        shifted = (V.astype(np.uint64)) << (
            (64 - (starts & 7) - L).astype(np.uint64)
        )
        acc = np.zeros(nbytes + 8, dtype=np.float64)
        for j in range(5):
            lane = ((shifted >> np.uint64(56 - 8 * j)) & np.uint64(0xFF))
            acc[: nbytes + 8] += np.bincount(
                byte_start + j,
                weights=lane.astype(np.float64),
                minlength=nbytes + 8,
            )
        packed = acc[:nbytes].astype(np.uint8)
        if npad:
            packed[-1] |= (1 << npad) - 1  # flush 1-padding, per spec
    else:
        packed = np.full(nbytes, 0xFF, dtype=np.uint8)  # pad-only scan
    # byte stuffing: 0xFF → 0xFF 0x00 (zeros land in the gaps for free)
    counts = np.where(packed == 0xFF, 2, 1)
    out = np.zeros(int(counts.sum()), dtype=np.uint8)
    out[np.cumsum(counts) - counts] = packed
    return out.tobytes()


def _dct_quant_ref(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Reference DCT+quantize: the original 3-operand einsum (naive
    summation order). Kept as the equality oracle for the matmul hot
    path — the same scalar-reference discipline as the entropy coder."""
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    quant = coef / qt[None, :, :]
    # half-away-from-zero (np.round is banker's — not what libjpeg does)
    quant = np.sign(quant) * np.floor(np.abs(quant) + 0.5)
    return quant.reshape(-1, 64)[:, _ZIG].astype(np.int64)


def _dct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Hot-path DCT+quantize: batched BLAS matmuls (C @ B @ C^T), ~10×
    faster than the naive einsum. Floating summation order differs from
    the reference, but the QUANTIZED outputs are identical on 30 random
    trials AND exhaustively on every reachable encoder input (the 10
    deterministic probe cards × every tier width — the fixture domain is
    closed), pinned by test_minijpeg_dct_matmul_matches_einsum; a numpy/
    BLAS change that ever rounded one coefficient differently would trip
    that pin, not silently re-key the image oracles."""
    coef = (_C @ blocks) @ _C.T
    quant = coef / qt[None, :, :]
    quant = np.sign(quant) * np.floor(np.abs(quant) + 0.5)
    return quant.reshape(-1, 64)[:, _ZIG].astype(np.int64)


def _dht_segment(tclass: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
    bits, vals = spec
    body = bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(width: int, height: int, rgb: bytes, quality: int = 80) -> bytes:
    """8-bit RGB pixels (row-major, 3*width*height bytes) → baseline JFIF
    bytes. Deterministic: float DCT, half-away-from-zero quantization."""
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb buffer size mismatch")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    # BT.601 full-range (the JFIF convention)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    qy, qc = quant_tables(quality)

    comps = [
        _dct_quant(_blocks(plane), qt)
        for plane, qt in ((y, qy), (cb, qc), (cr, qc))
    ]

    # one interleaved scan; with 4:4:4 an MCU is one block per component.
    # Vectorized coder (round 10) — byte-identical to the scalar
    # reference (_encode_scan_scalar, pinned by property test).
    scan = _encode_scan(comps)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qy), (1, qc)):
        body = bytes([tid]) + bytes(int(qt.reshape(-1)[_ZIG[k]]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling: 4:4:4
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA)
    out += _dht_segment(1, 0, _AC_LUMA)
    out += _dht_segment(0, 1, _DC_CHROMA)
    out += _dht_segment(1, 1, _AC_CHROMA)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | br.bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Baseline JFIF bytes (the subset encode_jpeg emits: 3 components,
    4:4:4, standard precision) → (width, height, RGB bytes). Raises
    ValueError on anything outside that subset."""
    if data[:3] != MAGIC:
        raise ValueError("not a JPEG")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = 0
    comp_q: dict[int, int] = {}
    scan_tabs: dict[int, tuple[int, int]] = {}
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                tid = body[off] & 0x0F
                if body[off] >> 4:
                    raise ValueError("16-bit quant tables unsupported")
                z = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8)
                qt = np.zeros(64, dtype=np.int32)
                qt[_ZIG] = z
                qts[tid] = qt.reshape(8, 8)
                off += 65
        elif marker == 0xC0:  # SOF0 baseline
            height, width = struct.unpack(">HH", body[1:5])
            if body[0] != 8 or body[5] != 3:
                raise ValueError("only 8-bit 3-component supported")
            for c in range(3):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 supported")
                comp_q[cid] = tq
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                hts[(tc, th)] = _huff_decoder(bits, vals)
                off += 17 + nv
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs[cid] = (tabs >> 4, tabs & 0x0F)
            pos += seglen
            break
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("non-baseline JPEG unsupported")
        pos += seglen

    br = _BitReader(data[pos:])
    bw8, bh8 = (width + 7) // 8, (height + 7) // 8
    planes = [np.zeros((bh8 * 8, bw8 * 8)) for _ in range(3)]
    prev_dc = [0, 0, 0]
    for by in range(bh8):
        for bx in range(bw8):
            for ci, cid in enumerate((1, 2, 3)):
                td, ta = scan_tabs[cid]
                dct = hts[(0, td)]
                act = hts[(1, ta)]
                zz = np.zeros(64, dtype=np.int64)
                s = _read_huff(br, dct)
                diff = _extend(br.bits(s), s) if s else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = _read_huff(br, act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    zz[k] = _extend(br.bits(s), s)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIG] = zz
                qt = qts[comp_q[cid]]
                block = coef.reshape(8, 8) * qt
                pix = _C.T @ block @ _C
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix

    y = planes[0][:height, :width] + 128.0
    cb = planes[1][:height, :width]
    cr = planes[2][:height, :width]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return width, height, rgb.tobytes()
