"""Independent reference DCT for the multimodal oracle pins (round-13
VERDICT "What's wrong" #3): the three re-pinned literals — the planted
pHash hamming 6 for pair (18,19) and the two image avg_feature0 values —
were regenerated from the implementation's own (now deterministic)
output, so the pins alone could no longer catch a bug in that
implementation.  These tests recompute them through a DCT written from
the mathematical definition in this file:

  * the basis is built with ``math.cos`` (independent of ``np.cos`` and
    of the module constants), snapped to the same spec'd 2^-40 grid;
  * the matrix product is a scalar triple loop accumulating j-ascending
    from 0.0 — the IEEE-754 operation sequence the spec (the
    ``matmul_ordered`` docstring) defines, with none of its vectorized
    indexing shared;
  * the pHash median/threshold/bit packing is re-derived here from the
    documented algorithm (sorted middle element of the 63 AC
    coefficients, strict >).

The pin tests never call ``matmul_ordered``: the pHash path is computed
entirely by this file's DCT, and the JPEG-decode path runs with the
module's matmul REPLACED by this file's scalar reference (monkeypatch),
so a bug in the vectorized implementation or in either quantized basis
constant now fails a test instead of being re-pinned.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

# ---------------------------------------------------------------------------
# The independent reference implementation
# ---------------------------------------------------------------------------


def _ref_basis(n: int) -> np.ndarray:
    """Orthonormal n-point DCT-II basis from the definition, math.cos,
    quantized to the 2^-40 grid the spec fixes."""
    b = np.empty((n, n), dtype=np.float64)
    for u in range(n):
        for x in range(n):
            c = math.sqrt(2.0 / n) * math.cos(
                math.pi * (2 * x + 1) * u / (2 * n)
            )
            if u == 0:
                c /= math.sqrt(2.0)
            b[u, x] = round(c * (1 << 40)) / (1 << 40)
    return b


def _ref_matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Scalar j-ascending multiply-accumulate from 0.0 — the exact IEEE
    operation sequence the matmul_ordered docstring specifies, written
    as the naive triple loop."""
    m, n, p = a.shape[0], a.shape[1], b.shape[1]
    out = np.zeros((m, p), dtype=np.float64)
    for i in range(m):
        for k in range(p):
            acc = 0.0
            for j in range(n):
                acc = acc + a[i, j] * b[j, k]
            out[i, k] = acc
    return out


def _ref_phash64(lum: np.ndarray) -> int:
    """The documented pHash algorithm, with this file's DCT."""
    basis = _ref_basis(32)
    lum = lum.astype(np.float64)
    ys = (np.arange(32) * lum.shape[0]) // 32
    xs = (np.arange(32) * lum.shape[1]) // 32
    small = lum[np.ix_(ys, xs)]
    dct = _ref_matmul(_ref_matmul(basis, small), basis.T)
    block = [float(v) for v in dct[:8, :8].flatten()]
    med = sorted(block[1:])[31]  # median of the 63 AC coefficients
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    return bits


def _davg_round6(vals: list[float], scale: int = 9) -> float:
    """Replicates queries/exact.davg + F.round(..., 6): per-value cast to
    DECIMAL(30,scale) (HALF_UP), exact decimal sum, cast to double,
    divide by count, HALF_UP round to 6 decimals."""
    q = Decimal(1).scaleb(-scale)
    s = sum(Decimal(v).quantize(q, rounding=ROUND_HALF_UP) for v in vals)
    avg = float(s) / len(vals)
    return float(Decimal(avg).quantize(Decimal("1e-6"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# Basis and operator independence checks
# ---------------------------------------------------------------------------


def test_quantized_dct_bases_match_independent_definition():
    # The committed 2^-40-grid constants must equal the grid snap of the
    # mathematical definition exactly (the docstrings claim no fixed
    # angle lands within 2^-41 of a grid boundary, so np.cos-vs-math.cos
    # last-ulp differences cannot move a snapped entry).
    from lab_etl_spark.multimodal.columns import _DCT32
    from lab_etl_spark.multimodal.jpeg import _C

    assert np.array_equal(_C, _ref_basis(8))
    assert np.array_equal(_DCT32, _ref_basis(32))


def test_ordered_matmul_matches_scalar_ieee_reference():
    # matmul_ordered's rank-1 vectorized accumulation must be
    # BIT-identical to the scalar reference on every element (same IEEE
    # op sequence), and the composed transform must be a real DCT
    # (fsum-based definition within analytic tolerance).
    from lab_etl_spark.multimodal.jpeg import _C, matmul_ordered

    rng = np.random.RandomState(7)
    blk = np.round(rng.rand(8, 8) * 255)
    got = matmul_ordered(matmul_ordered(_C, blk), _C.T)
    ref = _ref_matmul(_ref_matmul(_C, blk), _C.T)
    assert np.array_equal(got, ref)

    # mathematical DCT-II via exact-rounded fsum and unquantized cosines
    true = np.empty((8, 8))
    for u in range(8):
        for v in range(8):
            cu = math.sqrt(0.125) if u == 0 else 0.5
            cv = math.sqrt(0.125) if v == 0 else 0.5
            true[u, v] = cu * cv * math.fsum(
                blk[x, y]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
                for x in range(8)
                for y in range(8)
            )
    assert np.abs(got - true).max() < 1e-7


# ---------------------------------------------------------------------------
# The three re-pinned oracle literals, reproduced independently
# ---------------------------------------------------------------------------

# q_phash_dedup ground truth (queries/multimodal_q.py _PHASH_DEDUP_GT):
# hamming distance per planted pair (2i, 2i+1), i = 0..23.
_PHASH_GT_HAMMING = [
    0, 2, 0, 2, 0, 0, 0, 0, 2, 6, 0, 0,
    0, 0, 0, 2, 0, 0, 2, 0, 0, 2, 0, 0,
]


def test_phash_pins_from_independent_dct(spark):
    # Every planted-pair hamming — including the re-pinned 6 for pair
    # (18,19) — recomputed with this file's DCT over the repo's decoded
    # luminance planes (pixel decode is pinned byte-exactly elsewhere:
    # test_multimodal_decode.py roundtrip tests).  No matmul_ordered.
    from lab_etl_spark.multimodal.columns import (
        _image_pixels,
        _luminance,
        make_near_dup_assets,
    )

    rows = make_near_dup_assets(spark, n_pairs=24).collect()
    content = {r.asset_id: bytes(r.content) for r in rows}
    hashes = {}
    for aid, raw in content.items():
        px = _image_pixels(raw)
        assert px is not None, f"asset {aid} failed to decode"
        hashes[aid] = _ref_phash64(_luminance(px))
    for i, want in enumerate(_PHASH_GT_HAMMING):
        got = bin(hashes[2 * i] ^ hashes[2 * i + 1]).count("1")
        assert got == want, f"pair ({2 * i},{2 * i + 1}): {got} != {want}"


def test_decode_and_resize_feature_pins_with_reference_dct(spark, monkeypatch):
    # The two re-pinned image avg_feature0 literals — 0.500342
    # (q_multimodal_decode) and 0.500835 (q_image_resize) — recomputed
    # in-process with the module's matmul REPLACED by the scalar
    # reference, so the JPEG IDCT feeding the luminance features is this
    # file's DCT, not the implementation's.
    from lab_etl_spark.multimodal import jpeg as jpeg_mod

    monkeypatch.setattr(jpeg_mod, "matmul_ordered", _ref_matmul)

    from lab_etl_spark.multimodal.columns import (
        header_decode,
        make_asset_table,
        resize_image_content,
    )

    rows = make_asset_table(spark, n=96).collect()
    assets = [(r.asset_id, r.modality, bytes(r.content)) for r in rows]

    feats = [
        header_decode(c, m)["feature"][0]
        for _, m, c in assets
        if m == "image"
    ]
    assert len(feats) == 64
    assert _davg_round6(feats) == 0.500342

    resized = [
        header_decode(resize_image_content(c, 16, 12), "image")
        for _, m, c in assets
        if m == "image"
    ]
    assert all(d["width"] == 16 and d["height"] == 12 for d in resized)
    assert _davg_round6([d["feature"][0] for d in resized]) == 0.500835
