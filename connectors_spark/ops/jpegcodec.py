"""Stdlib-only baseline JPEG codec (grayscale, ITU-T.81 sequential DCT).

Closes the "compressed codecs remain guarded" gap left after round 6's
PNG/BMP/WAV/AVI stdlib codecs: baseline JPEG needs nothing beyond
`struct` + numpy (Huffman is pure Python, the 8×8 DCT/IDCT is two tiny
matmuls), so the `decode_image` seam in ops/multimodal.py can run a
REAL compressed-format pixel path.

Scope (documented, raises outside it):
- decode: baseline sequential DCT (SOF0) AND progressive DCT (SOF2,
  ITU-T.81 Annex G: spectral selection, successive approximation,
  EOBn runs, DC/AC refinement scans), 8-bit, grayscale or color with
  any integer-ratio sampling (4:4:4, 4:2:0, 4:2:2, 4:4:0, 4:1:1 —
  interleaved MCUs, replication chroma upsample, JFIF YCbCr→RGB),
  Huffman tables read from the file's DHT segments (any valid
  tables, not just Annex K), restart intervals (DRI + RSTn);
  arithmetic coding and lossless/extended SOFs raise.
- encode: real pipeline — level shift, float 2-D DCT-II, quantize
  (round-to-nearest), zigzag, DC-diff + AC run-length Huffman with
  byte stuffing — emitting a spec-conformant JFIF stream whose DQT /
  DHT / SOF0 / SOS segments the decoder (or any JPEG reader) parses.

Determinism: the corpus generator (ops/multimodal.synth_jpeg_media)
feeds piecewise-constant blocks whose DC coefficients quantize and
reconstruct EXACTLY (values chosen so S00 = 8·(p−128) is a multiple of
the quantizer), so decoded pixels equal the closed-form rule bit-for-
bit and a DuckDB oracle can recompute them; arbitrary images round-trip
lossily like any JPEG (tested with tolerance).

Scale note: same as imagecodec.py — this runs inside Arrow-batched
mapInPandas; swap in libjpeg-turbo via the identical seam for a real
100 TB corpus.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# DCT basis (orthonormal 8-point DCT-II; JPEG's FDCT/IDCT pair)
# ---------------------------------------------------------------------------

_T = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _T[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _zigzag_order() -> List[Tuple[int, int]]:
    """The spec's zigzag scan, generated (not hardcoded): walk the 15
    anti-diagonals, alternating direction, upper-left to lower-right."""
    out = []
    for s in range(15):
        cells = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        out.extend(cells if s % 2 else cells[::-1])
    return out


_ZZ = _zigzag_order()

# Spec-conformant custom Huffman tables (JPEG permits any canonical
# tables carried in DHT; the decoder reads them from the file, so
# Annex-K files decode too). DC: 12 categories, all 4-bit codes.
# AC: EOB, ZRL and every (run 0-15, size 1-10) at 8 bits (162 ≤ 256).
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = ([0x00, 0xF0]
            + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


def _canonical_codes(bits: List[int],
                     vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """value -> (code, length) via the JPEG canonical algorithm."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:           # byte stuffing
                self.buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:                 # pad to byte boundary with 1-bits
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _encode_block(w: _BitWriter, blk: "np.ndarray", q: "np.ndarray",
                  prev_dc: int) -> int:
    """FDCT + quantize + Huffman-encode one 8×8 block; returns its
    quantized DC (the next block's predictor)."""
    coef = _T @ blk @ _T.T
    cq = np.round(coef / q).astype(np.int64)
    zzc = [int(cq[r, c]) for r, c in _ZZ]
    diff = zzc[0] - prev_dc
    s = _category(diff)
    code, length = _DC_ENC[s]
    w.put(code, length)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zzc[i]), default=0)
    for i in range(1, last_nz + 1):
        v = zzc[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c16, l16 = _AC_ENC[0xF0]
            w.put(c16, l16)
            run -= 16
        s = _category(v)
        if s > 10:
            raise ValueError("AC coefficient too large")
        code, length = _AC_ENC[(run << 4) | s]
        w.put(code, length)
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = _AC_ENC[0x00]                    # EOB
        w.put(code, length)
    return zzc[0]


def _headers(width: int, height: int, q: "np.ndarray",
             ncomp: int, restart_interval: int = 0) -> bytearray:
    out = bytearray(b"\xff\xd8")                        # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz = bytes(int(q[r][c]) for r, c in _ZZ)
    out += _seg(0xFFDB, b"\x00" + zz)                   # DQT, 8-bit, id 0
    comps = b"".join(bytes([cid, 0x11, 0])
                     for cid in range(1, ncomp + 1))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, ncomp)
                + comps)                                # SOF0
    out += _seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp]) + b"".join(bytes([cid, 0x00])
                                    for cid in range(1, ncomp + 1)) \
        + bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)                            # SOS
    return out


def encode_jpeg_gray(width: int, height: int, pixels: bytes,
                     quant: int = 16,
                     restart_interval: int = 0) -> bytes:
    """Encode an 8-bit grayscale image (dimensions must be multiples
    of 8) as a baseline JFIF stream with a flat quantization table of
    ``quant``. ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every that many MCUs (predictors reset, ITU-T.81 §E.1.2) —
    the error-resilience device most real encoders use."""
    if width % 8 or height % 8:
        raise ValueError("encode_jpeg_gray needs multiple-of-8 dims")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8) \
        .reshape(height, width).astype(np.float64) - 128.0
    q = np.full((8, 8), float(quant))
    out = _headers(width, height, q, 1, restart_interval)
    w = _BitWriter()
    prev_dc = 0
    mcu = 0
    rst = 0
    for by in range(height // 8):
        for bx in range(width // 8):
            if restart_interval and mcu \
                    and mcu % restart_interval == 0:
                w.flush()
                w.buf += bytes((0xFF, 0xD0 + (rst & 7)))
                rst += 1
                prev_dc = 0
            mcu += 1
            prev_dc = _encode_block(
                w, img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8], q, prev_dc)
    w.flush()
    out += w.buf
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


def _ycbcr_planes(width: int, height: int, rgb: bytes):
    arr = np.frombuffer(bytes(rgb), dtype=np.uint8) \
        .reshape(height, width, 3).astype(np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    return [
        0.299 * r + 0.587 * g + 0.114 * b - 128.0,          # Y (shifted)
        -0.168736 * r - 0.331264 * g + 0.5 * b,             # Cb - 128
        0.5 * r - 0.418688 * g - 0.081312 * b,              # Cr - 128
    ]


def encode_jpeg_color(width: int, height: int, rgb: bytes,
                      quant: int = 16) -> bytes:
    """Encode 8-bit interleaved RGB (w*h*3 bytes, multiple-of-8 dims)
    as a baseline 4:4:4 color JFIF stream: JFIF RGB→YCbCr, then one
    interleaved MCU (Y, Cb, Cr block) per 8×8 tile with independent DC
    predictors per component (ITU-T.81 §A.2)."""
    if width % 8 or height % 8:
        raise ValueError("encode_jpeg_color needs multiple-of-8 dims")
    planes = _ycbcr_planes(width, height, rgb)
    q = np.full((8, 8), float(quant))
    out = _headers(width, height, q, 3)
    w = _BitWriter()
    prev = [0, 0, 0]
    for by in range(height // 8):
        for bx in range(width // 8):
            for ci, plane in enumerate(planes):
                prev[ci] = _encode_block(
                    w, plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                    q, prev[ci])
    w.flush()
    out += w.buf
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


def encode_jpeg_color_422(width: int, height: int, rgb: bytes,
                          quant: int = 16) -> bytes:
    """Encode interleaved RGB as baseline 4:2:2 (the common
    video-derived layout): Y sampled 0x21 (two Y blocks per MCU, side
    by side), chroma 0x11 and horizontally 1×2-mean-subsampled.
    Width must be a multiple of 16, height of 8 (one MCU row = one
    block row)."""
    if width % 16 or height % 8:
        raise ValueError("encode_jpeg_color_422 needs width %16, height %8")
    y, cb, cr = _ycbcr_planes(width, height, rgb)
    cb = cb.reshape(height, width // 2, 2).mean(axis=2)
    cr = cr.reshape(height, width // 2, 2).mean(axis=2)
    q = np.full((8, 8), float(quant))
    out = bytearray(b"\xff\xd8")                        # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz = bytes(int(q[r][c]) for r, c in _ZZ)
    out += _seg(0xFFDB, b"\x00" + zz)
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)
                + bytes([1, 0x21, 0]) + bytes([2, 0x11, 0])
                + bytes([3, 0x11, 0]))                  # SOF0 4:2:2
    out += _seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    w = _BitWriter()
    prev = [0, 0, 0]
    for my in range(height // 8):
        for mx in range(width // 16):
            for sh in range(2):                         # two Y blocks
                blk = y[my * 8:my * 8 + 8,
                        mx * 16 + sh * 8:mx * 16 + sh * 8 + 8]
                prev[0] = _encode_block(w, blk, q, prev[0])
            prev[1] = _encode_block(
                w, cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], q, prev[1])
            prev[2] = _encode_block(
                w, cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], q, prev[2])
    w.flush()
    out += w.buf
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


def encode_jpeg_color_420(width: int, height: int, rgb: bytes,
                          quant: int = 16) -> bytes:
    """Encode interleaved RGB as baseline 4:2:0 (the dominant
    real-world layout): Y at full resolution (sampling 0x22), chroma
    2×2-mean-subsampled (0x11); each MCU carries four Y blocks then
    one Cb and one Cr (ITU-T.81 §A.2.3 interleave order). Dimensions
    must be multiples of 16."""
    if width % 16 or height % 16:
        raise ValueError("encode_jpeg_color_420 needs multiple-of-16 dims")
    y, cb, cr = _ycbcr_planes(width, height, rgb)
    cb = cb.reshape(height // 2, 2, width // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(height // 2, 2, width // 2, 2).mean(axis=(1, 3))
    q = np.full((8, 8), float(quant))
    out = bytearray(b"\xff\xd8")                        # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz = bytes(int(q[r][c]) for r, c in _ZZ)
    out += _seg(0xFFDB, b"\x00" + zz)
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)
                + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
                + bytes([3, 0x11, 0]))                  # SOF0 4:2:0
    out += _seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    w = _BitWriter()
    prev = [0, 0, 0]
    for my in range(height // 16):
        for mx in range(width // 16):
            for sv in range(2):                         # four Y blocks
                for sh in range(2):
                    blk = y[my * 16 + sv * 8:my * 16 + sv * 8 + 8,
                            mx * 16 + sh * 8:mx * 16 + sh * 8 + 8]
                    prev[0] = _encode_block(w, blk, q, prev[0])
            prev[1] = _encode_block(
                w, cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], q, prev[1])
            prev[2] = _encode_block(
                w, cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8], q, prev[2])
    w.flush()
    out += w.buf
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2, ITU-T.81 Annex G)
# ---------------------------------------------------------------------------

# Progressive AC table: every (run 0-15, size 0-10) symbol — size 0 is
# EOBn for run 0-14 (end-of-band run category) and ZRL for run 15 —
# all at 8 bits (176 ≤ 256, canonical).
_ACP_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
_ACP_BITS = [0] * 7 + [len(_ACP_VALS)] + [0] * 8
_ACP_ENC = _canonical_codes(_ACP_BITS, _ACP_VALS)


def _coef_blocks(plane: "np.ndarray", q: "np.ndarray") -> "np.ndarray":
    """FDCT + quantize every 8×8 block of a (level-shifted) plane →
    (bh, bw, 64) int array in zigzag order."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    tiles = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    # batched matmul in the SAME association as the sequential
    # encoder's _T @ blk @ _T.T — float contraction order changes
    # round-at-.5 results, and progressive must quantize identically
    coefs = np.matmul(np.matmul(_T, tiles), _T.T)
    cq = np.round(coefs / q).astype(np.int64)
    zz = np.array([r * 8 + c for r, c in _ZZ])
    return cq.reshape(bh, bw, 64)[:, :, zz]


class _ProgressiveWriter:
    """Emits the entropy data of progressive scans over pre-computed
    zigzag coefficient blocks — the libjpeg encode_mcu_{DC,AC}_{first,
    refine} algorithms (jcphuff.c), including EOBn runs and buffered
    correction bits."""

    def __init__(self):
        self.w = _BitWriter()
        self.eobrun = 0
        # TWO correction-bit buffers (jcphuff.c BE vs BR): bits owned
        # by the pending EOB run (completed blocks) flush with the EOBn
        # code; bits of the CURRENT block since the last symbol flush
        # right after that block's next symbol. Merging them re-orders
        # bits across the block boundary and desyncs the decoder.
        self.corr_run: List[int] = []
        self.corr_cur: List[int] = []

    def _emit_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            code, length = _ACP_ENC[n << 4]
            self.w.put(code, length)
            if n:
                self.w.put(self.eobrun - (1 << n), n)
            self.eobrun = 0
            for b in self.corr_run:
                self.w.put(b, 1)
            self.corr_run = []

    def _emit_cur(self) -> None:
        for b in self.corr_cur:
            self.w.put(b, 1)
        self.corr_cur = []

    def dc_first(self, blocks_iter, al: int) -> None:
        """Interleaved DC scan, Ah=0: point-transformed DC diffs.
        ``blocks_iter`` yields (comp_index, zigzag block)."""
        preds: Dict[int, int] = {}
        for ci, blk in blocks_iter:
            v = int(blk[0]) >> al                # arithmetic shift (§G.1.2.1)
            diff = v - preds.get(ci, 0)
            preds[ci] = v
            s = _category(diff)
            code, length = _DC_ENC[s]
            self.w.put(code, length)
            if s:
                self.w.put(diff if diff > 0 else diff + (1 << s) - 1, s)

    def dc_refine(self, blocks_iter, al: int) -> None:
        for _ci, blk in blocks_iter:
            self.w.put((int(blk[0]) >> al) & 1, 1)

    def ac_first(self, blocks, ss: int, se: int, al: int) -> None:
        def pt(v: int) -> int:                   # toward-zero (§G.1.2.2)
            return v >> al if v >= 0 else -((-v) >> al)

        for blk in blocks:
            r = 0
            for k in range(ss, se + 1):
                t = pt(int(blk[k]))
                if t == 0:
                    r += 1
                    continue
                self._emit_eobrun()
                while r > 15:
                    code, length = _ACP_ENC[0xF0]
                    self.w.put(code, length)
                    r -= 16
                s = _category(t)
                code, length = _ACP_ENC[(r << 4) | s]
                self.w.put(code, length)
                self.w.put(t if t > 0 else t + (1 << s) - 1, s)
                r = 0
            if r:
                self.eobrun += 1
                if self.eobrun == 0x7FFF:
                    self._emit_eobrun()

    def ac_refine(self, blocks, ss: int, se: int, al: int) -> None:
        for blk in blocks:
            absv = [(abs(int(blk[k])) >> al) for k in range(ss, se + 1)]
            eob = ss - 1                         # last newly-significant
            for i, t in enumerate(absv):
                if t == 1:
                    eob = ss + i
            r = 0
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    self._emit_eobrun()
                    code, length = _ACP_ENC[0xF0]
                    self.w.put(code, length)
                    r -= 16
                    self._emit_cur()
                if t > 1:                        # already significant
                    self.corr_cur.append(t & 1)
                    continue
                self._emit_eobrun()
                code, length = _ACP_ENC[(r << 4) | 1]
                self.w.put(code, length)
                self.w.put(1 if int(blk[k]) > 0 else 0, 1)
                self._emit_cur()
                r = 0
            if r or self.corr_cur:
                self.eobrun += 1
                self.corr_run += self.corr_cur
                self.corr_cur = []
                if self.eobrun == 0x7FFF or len(self.corr_run) > 900:
                    self._emit_eobrun()

    def finish_scan(self) -> bytes:
        self._emit_eobrun()
        self.w.flush()
        out = bytes(self.w.buf)
        self.w = _BitWriter()
        return out


def encode_jpeg_progressive(width: int, height: int, pixels: bytes,
                            channels: int = 1,
                            quant: int = 16,
                            subsampling: str = "444") -> bytes:
    """Encode as PROGRESSIVE JPEG (SOF2): grayscale, 4:4:4 or 4:2:0
    color (``subsampling="420"``, multiple-of-16 dims — the dominant
    real-world progressive layout), flat quantizer. Scan script (the
    common spectral-selection + successive-approximation shape):

        1. DC, all components, Al=1
        2. DC refinement, Ah=1 → Al=0 (raw bits)
        3. per component: AC band 1-5 then 6-63, Al=1 (EOBn runs)
        4. per component: the same bands refined Ah=1 → Al=0
           (correction bits)

    After every scan the coefficients are bit-exact equal to the
    sequential encoder's, so the closed-form-exact corpus rule decodes
    identically through either path."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = channels == 3 and subsampling == "420"
    if sub420:
        if width % 16 or height % 16:
            raise ValueError(
                "progressive 4:2:0 needs multiple-of-16 dims")
    elif width % 8 or height % 8:
        raise ValueError("encode_jpeg_progressive needs multiple-of-8 dims")
    if channels == 1:
        img = np.frombuffer(bytes(pixels), dtype=np.uint8) \
            .reshape(height, width).astype(np.float64) - 128.0
        planes = [img]
    elif channels == 3:
        planes = _ycbcr_planes(width, height, pixels)
        if sub420:
            # 2×2-mean chroma, same prep as the baseline 4:2:0 encoder
            for i in (1, 2):
                planes[i] = planes[i].reshape(
                    height // 2, 2, width // 2, 2).mean(axis=(1, 3))
    else:
        raise ValueError("channels must be 1 or 3")
    q = np.full((8, 8), float(quant))
    coefs = [_coef_blocks(p, q) for p in planes]
    # per-component sampling factors and block grids (Y 2×2 at 4:2:0)
    samp = [(2, 2), (1, 1), (1, 1)] if sub420 \
        else [(1, 1)] * len(planes)
    grids = [c.shape[:2] for c in coefs]         # (bh, bw) per comp
    # MCU grid: the chroma (1,1) grid at 4:2:0, else the full grid
    mbh, mbw = grids[1] if sub420 else grids[0]

    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")                 # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz = bytes(int(q[r][c]) for r, c in _ZZ)
    out += _seg(0xFFDB, b"\x00" + zz)
    comps = b"".join(
        bytes([cid, (samp[cid - 1][0] << 4) | samp[cid - 1][1], 0])
        for cid in range(1, ncomp + 1))
    out += _seg(0xFFC2, struct.pack(">BHHB", 8, height, width, ncomp)
                + comps)                         # SOF2
    out += _seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(_ACP_BITS)
                + bytes(bytearray(_ACP_VALS)))

    def sos(comp_ids: List[int], ss: int, se: int, ah: int,
            al: int) -> bytes:
        hdr = bytes([len(comp_ids)]) \
            + b"".join(bytes([cid, 0x00]) for cid in comp_ids) \
            + bytes([ss, se, (ah << 4) | al])
        return _seg(0xFFDA, hdr)

    pw = _ProgressiveWriter()

    def mcu_blocks():
        # interleaved MCU order (§A.2.3): h×v blocks per component,
        # raster within the MCU — matches the decoder's DC walk
        for my in range(mbh):
            for mx in range(mbw):
                for ci in range(ncomp):
                    h, v = samp[ci]
                    for sv in range(v):
                        for sh in range(h):
                            yield ci, coefs[ci][my * v + sv,
                                                mx * h + sh]

    def comp_blocks(ci: int):
        gh, gw = grids[ci]
        for by in range(gh):
            for bx in range(gw):
                yield coefs[ci][by, bx]

    all_ids = list(range(1, ncomp + 1))
    out += sos(all_ids, 0, 0, 0, 1)              # scan 1: DC, Al=1
    pw.dc_first(mcu_blocks(), 1)
    out += pw.finish_scan()
    out += sos(all_ids, 0, 0, 1, 0)              # scan 2: DC refine
    pw.dc_refine(mcu_blocks(), 0)
    out += pw.finish_scan()
    for ci in range(ncomp):                      # AC first, Al=1
        for lo, hi in ((1, 5), (6, 63)):
            out += sos([ci + 1], lo, hi, 0, 1)
            pw.ac_first(comp_blocks(ci), lo, hi, 1)
            out += pw.finish_scan()
    for ci in range(ncomp):                      # AC refine, Al=0
        for lo, hi in ((1, 5), (6, 63)):
            out += sos([ci + 1], lo, hi, 1, 0)
            pw.ac_refine(comp_blocks(ci), lo, hi, 0)
            out += pw.finish_scan()
    out += b"\xff\xd9"                           # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _HuffTable:
    """Canonical Huffman decode table built from a DHT (BITS, VALS)."""

    def __init__(self, bits: List[int], vals: List[int]):
        self.lookup: Dict[Tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def read(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1           # stuffed byte
                else:
                    raise ValueError(f"marker 0xFF{nxt:02x} mid-scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def restart(self, expect: int) -> None:
        """Consume an RSTn marker at a byte boundary (ITU-T.81 §E.1.2):
        discard pad bits, verify the marker modulo-8 sequence number,
        advance past it."""
        self._n = 0
        if self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        if m != 0xD0 + (expect & 7):
            raise ValueError(
                f"restart marker out of sequence: 0xFF{m:02x}")
        self.pos += 2

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.receive(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> Tuple[int, int, int, bytes]:
    """Decode a baseline grayscale JPEG → (width, height, 1, pixels).

    Real entropy decode: canonical Huffman from the file's DHT, DC
    prediction, AC run-length/EOB/ZRL, dequantize from DQT, inverse
    zigzag, float IDCT, level shift + clamp."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    dc_tabs: Dict[int, _HuffTable] = {}
    ac_tabs: Dict[int, _HuffTable] = {}
    width = height = -1
    comps: list = []
    restart_interval = 0
    progressive = False
    coef: list = []          # per-comp (bh_pad, bw_pad, 64) zigzag coeffs
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = struct.unpack(">H", data[pos:pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:                            # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if marker == 0xFFDB:                            # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit DQT unsupported")
                tab = np.zeros((8, 8))
                for i, (r, c) in enumerate(_ZZ):
                    tab[r, c] = body[o + 1 + i]
                qt[tq] = tab
                o += 65
        elif marker == 0xFFC4:                          # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1:o + 17])
                n = sum(bits)
                vals = list(body[o + 17:o + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _HuffTable(bits, vals)
                o += 17 + n
        elif marker in (0xFFC0, 0xFFC1, 0xFFC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2
            # progressive. An 8-bit SOF1 stream decodes EXACTLY like
            # SOF0 (T.81 §B.2.2 — the extension only widens precision
            # to 12 bits and the table budget, both gated below).
            progressive = marker == 0xFFC2
            prec, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise NotImplementedError(
                    "only 8-bit 1- or 3-component baseline supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            # Sampling is generic in the MCU loop below: any per-
            # component (h, v) in 1..4 whose ratios to (hmax, vmax)
            # divide evenly (the replication upsample needs integer
            # ratios). Covers grayscale, 4:4:4, 4:2:0 (2,2), 4:2:2
            # (2,1), 4:4:0 (1,2) and 4:1:1 (4,1).
            hm = max(h for _, h, _v, _ in comps)
            vm = max(v for _, _h, v, _ in comps)
            for _, h, v, _ in comps:
                if not (1 <= h <= 4 and 1 <= v <= 4
                        and hm % h == 0 and vm % v == 0):
                    raise NotImplementedError(
                        f"unsupported sampling factors ({h},{v})")
        elif marker in (0xFFC3, 0xFFC9, 0xFFCA):
            raise NotImplementedError(
                f"unsupported SOF 0x{marker:04x} (lossless / "
                f"arithmetic coding — the QM-coder state table is "
                f"not reproducible from the spec text alone)")
        elif marker == 0xFFDD:                          # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA and progressive:          # SOS (one of many)
            hmax = max(h for _, h, _v, _ in comps)
            vmax = max(v for _, _h, v, _ in comps)
            mbw = (width + 8 * hmax - 1) // (8 * hmax)
            mbh = (height + 8 * vmax - 1) // (8 * vmax)
            if not coef:
                coef = [np.zeros((mbh * v, mbw * h, 64), dtype=np.int32)
                        for _, h, v, _ in comps]
            pos = _progressive_scan(
                data, pos, seglen, body, comps, dc_tabs, ac_tabs, coef,
                width, height, hmax, vmax, mbw, mbh, restart_interval)
            continue
        elif marker == 0xFFDA:                          # SOS
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "scan must cover every frame component")
            scan_tabs = {}                              # cid -> (dc, ac)
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                tb = body[2 + 2 * ci]
                scan_tabs[cid] = (dc_tabs[tb >> 4], ac_tabs[tb & 0x0F])
            br = _BitReader(data, pos + seglen)
            hmax = max(h for _, h, _v, _ in comps)
            vmax = max(v for _, _h, v, _ in comps)
            mcu_w, mcu_h = 8 * hmax, 8 * vmax
            mbw = (width + mcu_w - 1) // mcu_w
            mbh = (height + mcu_h - 1) // mcu_h
            planes = [np.zeros((mbh * v * 8, mbw * h * 8),
                               dtype=np.float64)
                      for _, h, v, _ in comps]
            prev = [0] * len(comps)
            mcu_count = 0
            rst_seq = 0
            for my in range(mbh):
                for mx in range(mbw):
                    if restart_interval and mcu_count \
                            and mcu_count % restart_interval == 0:
                        br.restart(rst_seq)
                        rst_seq = (rst_seq + 1) & 7
                        prev = [0] * len(comps)
                    mcu_count += 1
                    # one interleaved MCU: h×v blocks per component,
                    # raster order within the MCU (ITU-T.81 §A.2.3)
                    for ci, (cid, ch, cv, tq) in enumerate(comps):
                        dct, act = scan_tabs[cid]
                        for sv in range(cv):
                            for sh in range(ch):
                                zzc = [0] * 64
                                s = dct.read(br)
                                prev[ci] += br.receive_extend(s)
                                zzc[0] = prev[ci]
                                i = 1
                                while i < 64:
                                    rs = act.read(br)
                                    if rs == 0x00:      # EOB
                                        break
                                    if rs == 0xF0:      # ZRL
                                        i += 16
                                        continue
                                    i += rs >> 4
                                    if i > 63:
                                        raise ValueError(
                                            "AC index overflow")
                                    zzc[i] = br.receive_extend(
                                        rs & 0x0F)
                                    i += 1
                                coef = np.zeros((8, 8))
                                for i, (r, c) in enumerate(_ZZ):
                                    coef[r, c] = zzc[i]
                                blk = _T.T @ (coef * qt[tq]) @ _T
                                py = (my * cv + sv) * 8
                                px_ = (mx * ch + sh) * 8
                                planes[ci][py:py + 8,
                                           px_:px_ + 8] = blk
            return _assemble(comps, planes, width, height, hmax, vmax)
        pos += seglen
    if progressive and coef:
        # all scans accumulated: dequantize, un-zigzag, IDCT every
        # block of every component in one vectorized pass each
        hmax = max(h for _, h, _v, _ in comps)
        vmax = max(v for _, _h, v, _ in comps)
        planes = []
        for ci, (cid, ch, cv, tq) in enumerate(comps):
            qzz = np.array([qt[tq][r, c] for r, c in _ZZ])
            deq = coef[ci].astype(np.float64) * qzz[None, None, :]
            bh, bw = deq.shape[:2]
            cmat = np.zeros((bh, bw, 8, 8))
            for i, (r, c) in enumerate(_ZZ):
                cmat[:, :, r, c] = deq[:, :, i]
            # same association as the baseline IDCT (_T.T @ X @ _T) so
            # both paths round identical floats to identical pixels
            blk = np.matmul(np.matmul(_T.T, cmat), _T)
            planes.append(np.transpose(blk, (0, 2, 1, 3))
                          .reshape(bh * 8, bw * 8))
        return _assemble(comps, planes, width, height, hmax, vmax)
    raise ValueError("no scan data found")


def _next_marker(data: bytes, p: int) -> int:
    """Position of the next marker at/after ``p`` (skipping entropy
    pad bits and stuffed 0xFF00 pairs)."""
    while p < len(data) - 1:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            return p
        p += 1
    return len(data)


def _progressive_scan(data: bytes, pos: int, seglen: int, body: bytes,
                      comps, dc_tabs, ac_tabs, coef, width: int,
                      height: int, hmax: int, vmax: int, mbw: int,
                      mbh: int, restart_interval: int) -> int:
    """Decode ONE progressive scan (ITU-T.81 §G.2) into the
    accumulated ``coef`` arrays and return the stream position of the
    next marker.

    Covers the full progressive feature set: interleaved or
    single-component DC scans, DC successive-approximation refinement
    (one raw bit per block), single-component AC scans with spectral
    selection (Ss..Se), AC first scans with EOBn run codes, AC
    refinement scans with correction bits (the libjpeg
    decode_mcu_AC_refine algorithm), and restart intervals (predictors
    and the EOB run reset)."""
    ns = body[0]
    scomps = []                                  # (ci, dc_id, ac_id)
    for i in range(ns):
        cid, tb = body[1 + 2 * i], body[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c[0] == cid)
        scomps.append((ci, tb >> 4, tb & 0x0F))
    ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    br = _BitReader(data, pos + seglen)
    state = {"eobrun": 0}

    def comp_grid(ci: int) -> Tuple[int, int]:
        # a non-interleaved scan covers the component's OWN block
        # grid (§A.2.2), not the MCU-padded one
        _, h, v, _ = comps[ci]
        cw = (-(-width * h // hmax) + 7) // 8
        chh = (-(-height * v // vmax) + 7) // 8
        return cw, chh

    def dc_first(ci: int, by: int, bx: int, pred: list, k: int,
                 tab) -> None:
        s = tab.read(br)
        pred[k] += br.receive_extend(s)
        coef[ci][by, bx, 0] = pred[k] << al

    def dc_refine(ci: int, by: int, bx: int) -> None:
        if br.bit():
            coef[ci][by, bx, 0] |= (1 << al)

    def ac_first(ci: int, by: int, bx: int, tab) -> None:
        blk = coef[ci][by, bx]
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = tab.read(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:                      # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.receive(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            blk[k] = br.receive_extend(s) << al
            k += 1

    def ac_refine(ci: int, by: int, bx: int, tab) -> None:
        blk = coef[ci][by, bx]
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = tab.read(br)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r)
                        if r:
                            state["eobrun"] += br.receive(r)
                        break                    # remainder below
                    s = 0                        # ZRL: skip 16 zeros
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement code")
                    s = p1 if br.bit() else m1
                # walk r zero-history coefficients, emitting a
                # correction bit for every nonzero-history one passed
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if br.bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    blk[k] = s
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                k += 1
            state["eobrun"] -= 1

    def maybe_restart(count: int, rst_seq: int, pred: list) -> int:
        if restart_interval and count and count % restart_interval == 0:
            br.restart(rst_seq)
            pred[:] = [0] * len(pred)
            state["eobrun"] = 0
            return (rst_seq + 1) & 7
        return rst_seq

    if ss == 0:                                  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        pred = [0] * len(scomps)
        rst_seq, count = 0, 0
        if ns > 1:                               # interleaved MCU order
            for my in range(mbh):
                for mx in range(mbw):
                    rst_seq = maybe_restart(count, rst_seq, pred)
                    count += 1
                    for k, (ci, dci, _aci) in enumerate(scomps):
                        _, h, v, _ = comps[ci]
                        for sv in range(v):
                            for sh in range(h):
                                by, bx = my * v + sv, mx * h + sh
                                if ah == 0:
                                    dc_first(ci, by, bx, pred, k,
                                             dc_tabs[dci])
                                else:
                                    dc_refine(ci, by, bx)
        else:
            ci, dci, _aci = scomps[0]
            cw, chh = comp_grid(ci)
            for by in range(chh):
                for bx in range(cw):
                    rst_seq = maybe_restart(count, rst_seq, pred)
                    count += 1
                    if ah == 0:
                        dc_first(ci, by, bx, pred, 0, dc_tabs[dci])
                    else:
                        dc_refine(ci, by, bx)
    else:                                        # AC scan
        if ns != 1:
            raise ValueError("progressive AC scan must be one component")
        ci, _dci, aci = scomps[0]
        cw, chh = comp_grid(ci)
        rst_seq, count = 0, 0
        pred: list = []
        for by in range(chh):
            for bx in range(cw):
                rst_seq = maybe_restart(count, rst_seq, pred)
                count += 1
                if ah == 0:
                    ac_first(ci, by, bx, ac_tabs[aci])
                else:
                    ac_refine(ci, by, bx, ac_tabs[aci])
    return _next_marker(data, br.pos)


def _assemble(comps, planes, width: int, height: int,
              hmax: int, vmax: int) -> Tuple[int, int, int, bytes]:
    """Spatial planes (level-shifted) → pixel bytes: replication
    chroma upsample + JFIF YCbCr→RGB (or grayscale clamp)."""
    if len(comps) == 1:
        px = np.clip(np.round(planes[0][:height, :width]) + 128,
                     0, 255).astype(np.uint8)
        return width, height, 1, px.tobytes()
    full = []
    for ci, (cid, ch, cv, _tq) in enumerate(comps):
        pl = planes[ci]
        if ch != hmax or cv != vmax:
            pl = np.repeat(np.repeat(pl, vmax // cv, axis=0),
                           hmax // ch, axis=1)
        full.append(pl[:height, :width])
    y = full[0] + 128.0
    cb, cr = full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, px.tobytes()
