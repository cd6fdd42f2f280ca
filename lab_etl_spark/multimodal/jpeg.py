"""Baseline JPEG codec in pure Python/numpy — no media library.

Coverage (decoder): baseline sequential DCT (SOF0), 8-bit precision,
Huffman entropy coding, grayscale or YCbCr at 4:4:4, 4:2:0, and 4:2:2
sampling (nearest-neighbor chroma upsample); restart intervals honored.
Progressive (SOF2), arithmetic coding, 12-bit, and sampling factors > 2
return None and the caller falls back to the labeled stand-in feature —
honest partial coverage, extendable.

The encoder exists so the synthetic asset lake and the tests can produce
REAL JPEG payloads without Pillow: it writes its own DQT/DHT segments
(near-identity quantization, fixed-length canonical Huffman tables), so
any spec-conforming decoder — including this one — reads it.  Encoder and
decoder share only the marker layout and the zigzag constant; the zigzag
is pinned against the spec sequence in tests to rule out
mirror-image-bug cancellation.

Reference parity note: ulfsri/lab-etl has no multimodal surface; this
module serves the driver's training-data-pipeline extension (SURVEY.md
§2B multimodal columns).
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 1:
            diag = diag[::-1]
        order.extend(diag)
    return order


#: JPEG zigzag scan: position k -> (row, col)
ZIGZAG = _zigzag_order()

#: orthonormal 8x8 DCT-II basis, quantized to a 2^-40 grid so a last-ulp
#: np.cos difference between hosts/builds collapses to identical doubles
#: (the pHash lesson, multimodal/columns.py _dct32_basis)
_C = np.round(
    np.array(
        [
            [
                np.cos((2 * x + 1) * u * np.pi / 16)
                * (np.sqrt(0.125) if u == 0 else 0.5)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    * (1 << 40)
) / (1 << 40)


def matmul_ordered(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Bit-reproducible matrix product: fixed left-to-right rank-1
    accumulation of elementwise products.

    ``a @ b`` goes through BLAS, whose kernels (chosen per CPU at runtime
    under OpenBLAS DYNAMIC_ARCH) reassociate the inner sums differently
    on different machines.  Here the DCT outputs feed knife-edge
    ``np.round`` calls — quantized coefficients on the encode side,
    integer pixels on the decode side — so a host change can flip a
    coefficient/pixel whose value sits within an ulp of a .5 boundary,
    silently changing every pinned artifact derived from decoded pixels
    (the exact failure the round-13 host change caused in phash64).
    Elementwise multiply and add are single correctly-rounded IEEE-754
    ops, so this accumulation order (j ascending) produces identical
    doubles on every host and numpy build."""
    acc = np.zeros((a.shape[0], b.shape[1]))
    for j in range(a.shape[1]):
        acc = acc + a[:, j : j + 1] * b[j : j + 1, :]
    return acc


def _fdct(block: np.ndarray) -> np.ndarray:
    return matmul_ordered(matmul_ordered(_C, block), _C.T)


def _idct(coef: np.ndarray) -> np.ndarray:
    return matmul_ordered(matmul_ordered(_C.T, coef), _C)


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing; a bare
    marker stops consumption (reads past it return zero bits, which the
    MCU loop terminates through)."""

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.i >= len(self.d):
                self.acc <<= 8  # zero-pad past end (shift! bits() reads
                self.n += 8     # from the top of an n-bit accumulator)
                continue
            byte = self.d[self.i]
            self.i += 1
            if byte == 0xFF:
                nxt = self.d[self.i] if self.i < len(self.d) else 0
                if nxt == 0x00:
                    self.i += 1
                else:
                    self.i -= 1  # stop at marker; zero-pad
                    self.acc <<= 8
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def resync_to_rst(self, base: bytes, offset: int) -> None:
        """Skip to just past the next RSTn marker (restart-interval sync)."""
        j = offset + self.i
        while j + 1 < len(base) and not (
            base[j] == 0xFF and 0xD0 <= base[j + 1] <= 0xD7
        ):
            j += 1
        self.i = j + 2 - offset
        self.acc = 0
        self.n = 0


def _build_huff(counts: list[int], symbols: list[int]) -> dict:
    table = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_pixels(b: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG to (h, w, 3) RGB (or (h, w, 1) gray) uint8;
    None for anything outside the documented coverage."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    dri = 0
    try:
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            m = b[i + 1]
            if m == 0xD9:
                break
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            seg = b[i + 4 : i + 2 + seglen]
            i += 2 + seglen
            if m == 0xDB:
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 15
                    j += 1
                    if pq != 0:
                        return None  # 16-bit quant: out of coverage
                    tbl = np.zeros((8, 8))
                    for k in range(64):
                        tbl[ZIGZAG[k]] = seg[j + k]
                    qt[tq] = tbl
                    j += 64
            elif m == 0xC4:
                j = 0
                while j < len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 15
                    counts = list(seg[j + 1 : j + 17])
                    total = sum(counts)
                    huff[(tc, th)] = _build_huff(
                        counts, list(seg[j + 17 : j + 17 + total])
                    )
                    j += 17 + total
            elif m == 0xC0:
                if seg[0] != 8:
                    return None
                h, w = struct.unpack(">HH", seg[1:5])
                comps = []
                for c in range(seg[5]):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
                frame = (h, w, comps)
            elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                       0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame type
            elif m == 0xDD:
                (dri,) = struct.unpack(">H", seg[:2])
            elif m == 0xDA:
                smap = {}
                for c in range(seg[0]):
                    cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    smap[cid] = (tt >> 4, tt & 15)
                return _decode_scan(b, i, frame, qt, huff, smap, dri)
    except (IndexError, struct.error, ValueError, ZeroDivisionError):
        return None
    return None


def _decode_scan(b, i, frame, qt, huff, smap, dri):
    if frame is None:
        return None
    h, w, comps = frame
    if not h or not w or h * w * 3 > 1 << 28:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None  # exotic sampling: out of coverage
    if any(c[1] < 1 or c[2] < 1 for c in comps):
        return None  # zero sampling factor: corrupt stream
    if any(hmax % c[1] or vmax % c[2] for c in comps):
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(b[i:])
    # per-component planes at COMPONENT resolution; upsampled after the scan
    planes = [
        np.zeros((mcuy * 8 * c[2], mcux * 8 * c[1])) for c in comps
    ]
    pred = [0] * len(comps)
    mcu = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcu and mcu % dri == 0:
                    br.resync_to_rst(b, i)
                    pred = [0] * len(comps)
                for ci, (cid, ch_, cv, tq) in enumerate(comps):
                    dc_t, ac_t = smap[cid]
                    for by in range(cv):
                        for bx in range(ch_):
                            coef = np.zeros((8, 8))
                            t = _decode_huff(br, huff[(0, dc_t)])
                            pred[ci] += _extend(br.bits(t), t)
                            coef[0, 0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _decode_huff(br, huff[(1, ac_t)])
                                r, s = rs >> 4, rs & 15
                                if rs == 0:
                                    break
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                k += r
                                if k > 63:
                                    break
                                coef[ZIGZAG[k]] = _extend(br.bits(s), s)
                                k += 1
                            r0 = (my * cv + by) * 8
                            c0 = (mx * ch_ + bx) * 8
                            planes[ci][r0 : r0 + 8, c0 : c0 + 8] = (
                                _idct(coef * qt[tq]) + 128
                            )
                mcu += 1
    except (KeyError, ValueError, IndexError):
        return None
    # nearest-neighbor chroma upsample to full resolution, then crop
    full = []
    for ci, (cid, ch_, cv, _) in enumerate(comps):
        p = planes[ci]
        if ch_ != hmax:
            p = np.repeat(p, hmax // ch_, axis=1)
        if cv != vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h, :w])
    out = np.stack(full, axis=-1)
    out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    if len(comps) == 3:
        y = out[:, :, 0].astype(np.float64)
        cb = out[:, :, 1].astype(np.float64) - 128.0
        cr = out[:, :, 2].astype(np.float64) - 128.0
        out = np.clip(
            np.round(
                np.stack(
                    [
                        y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb,
                    ],
                    -1,
                )
            ),
            0,
            255,
        ).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Minimal encoder (4:4:4 / grayscale, writes its own flat Huffman tables)
# ---------------------------------------------------------------------------

_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_SYMS = list(range(12))
_AC_SYMS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0}
)
_AC_BITS = [0] * 16
_AC_BITS[8] = len(_AC_SYMS)  # every AC symbol gets a 9-bit code


def _enc_table(bits: list[int], syms: list[int]) -> dict:
    out = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[syms[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _csize(v: int) -> int:
    return abs(int(v)).bit_length()


def _encode_block(bw, block, qtbl, pred, ci, dc_enc, ac_enc):
    qc = np.round(_fdct(block) / qtbl).astype(int)
    # the flat AC table tops out at size 10 (|coef| <= 1023); clamp ACs so
    # extreme blocks stay encodable (DC size 11 always fits: |dc| <=
    # 1024/quant, diff <= 2047)
    dc = qc[0, 0]
    qc = np.clip(qc, -1023, 1023)
    qc[0, 0] = dc
    diff = qc[0, 0] - pred[ci]
    pred[ci] = qc[0, 0]
    s = _csize(diff)
    ln, code = dc_enc[s]
    bw.write(code, ln)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(v & ((1 << s) - 1), s)
    zz = [qc[ZIGZAG[k]] for k in range(1, 64)]
    last_nz = max((k for k, v in enumerate(zz) if v), default=-1)
    run = 0
    for k in range(last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _csize(v)
        ln, code = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        vv = v if v >= 0 else v + (1 << s) - 1
        bw.write(vv & ((1 << s) - 1), s)
        run = 0
    if last_nz < 62:
        ln, code = ac_enc[0x00]
        bw.write(code, ln)


def _pad_plane(p, rows, cols):
    h, w = p.shape
    q = np.zeros((rows, cols))
    q[:h, :w] = p
    q[h:, :w] = p[-1:, :]
    q[:, w:] = q[:, w - 1 : w]
    return q


def write_jpeg_baseline(
    px: np.ndarray, quant_val: int = 2, subsample: int = 1
) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 as a baseline JFIF JPEG.

    ``subsample=1`` writes 4:4:4; ``subsample=2`` writes 4:2:0 (box-mean
    chroma downsample, Y sampling factors 2x2) — the layout nearly every
    camera/web JPEG uses, so the decoder's subsampled path gets a real
    in-repo producer."""
    gray = px.ndim == 2
    if gray:
        subsample = 1
    ss = subsample
    if ss not in (1, 2):
        raise ValueError("subsample must be 1 or 2")
    h, w = px.shape[:2]
    qtbl = np.full((8, 8), float(quant_val))
    dc_enc = _enc_table(_DC_BITS, _DC_SYMS)
    ac_enc = _enc_table(_AC_BITS, _AC_SYMS)
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b_ = px[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b_,
            -0.168736 * r - 0.331264 * g + 0.5 * b_ + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b_ + 128,
        ]
    mcux = (w + 8 * ss - 1) // (8 * ss)
    mcuy = (h + 8 * ss - 1) // (8 * ss)
    padded = []
    samp = []  # (h_factor, v_factor) per component
    for ci, p in enumerate(planes):
        if ci == 0 or ss == 1:
            padded.append(_pad_plane(p, mcuy * 8 * ss, mcux * 8 * ss))
            samp.append((ss, ss) if not gray and ss == 2 and ci == 0 else (ss if ci == 0 else 1,) * 2)
        else:
            # box-mean 2x2 chroma downsample at component resolution
            ph = _pad_plane(p, mcuy * 8 * ss, mcux * 8 * ss)
            down = ph.reshape(mcuy * 8, ss, mcux * 8, ss).mean(axis=(1, 3))
            padded.append(down)
            samp.append((1, 1))
    if ss == 1:
        samp = [(1, 1)] * len(planes)
    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, p in enumerate(padded):
                hf, vf = samp[ci]
                for by in range(vf):
                    for bx in range(hf):
                        r0 = (my * vf + by) * 8
                        c0 = (mx * hf + bx) * 8
                        _encode_block(
                            bw,
                            p[r0 : r0 + 8, c0 : c0 + 8] - 128.0,
                            qtbl,
                            pred,
                            ci,
                            dc_enc,
                            ac_enc,
                        )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    nc = 1 if gray else 3
    dqt = bytes([0]) + bytes(int(qtbl[ZIGZAG[k]]) for k in range(64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        hf, vf = samp[c]
        sof += bytes([c + 1, (hf << 4) | vf, 0])
    dht_dc = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS)
    dht_ac = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMS)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )
