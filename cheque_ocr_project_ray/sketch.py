"""Deterministic HyperLogLog sketch — the approximate-distinct scale
path for grouped cardinality (the exact form is
``relational.queries.events_user_count``).

Why a sketch: the exact distinct count shuffles one row per distinct
(group, key) pair; at 10^12 rows × high-cardinality keys that exchange
dominates.  An HLL partial is a FIXED 2^p-byte register array per
(batch, group) — the shuffle payload is O(groups × 2^p) regardless of
input size, and merge is an elementwise ``np.maximum``.

Determinism: key hashing is splitmix64 (a fixed integer mixer — no
process-seeded hashing), so estimates are identical across runs,
batch sizes, and cluster shapes.  Standard estimator with the
small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np

HLL_P = 12                 # 2^12 = 4096 registers, ~1.6% rel. error
HLL_M = 1 << HLL_P


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_partial(keys: np.ndarray) -> np.ndarray:
    """Register array (uint8[HLL_M]) for a batch of int-like keys."""
    h = _splitmix64(np.asarray(keys, dtype=np.uint64))
    idx = (h & np.uint64(HLL_M - 1)).astype(np.int64)
    w = h >> np.uint64(HLL_P)
    # rho = leading-zero count of the (64-p)-bit window + 1
    nbits = 64 - HLL_P
    # bit_length via log2 is unsafe at edges; use a loop over bits of
    # the float exponent instead: frexp gives exact bit lengths
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    # w < 2^(64-p) = 2^52 < 2^53, so the float64 conversion is EXACT
    # for every value and frexp's exponent is the true bit length (the
    # guard only matters if HLL_P ever drops below 11)
    assert HLL_P >= 11
    bl[nz] = np.frexp(w[nz].astype(np.float64))[1]
    rho = (nbits - bl + 1).astype(np.uint8)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(reg_blobs) -> np.ndarray:
    """Merge serialized register arrays (elementwise max)."""
    out = np.zeros(HLL_M, dtype=np.uint8)
    for blob in reg_blobs:
        out = np.maximum(out, np.frombuffer(blob, dtype=np.uint8))
    return out


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator + linear-counting small-range correction."""
    m = float(HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


# --- mergeable fixed-grid quantile sketch ----------------------------
QSK_BINS = 4096
QSK_LO = 0.0
QSK_HI = 512.0   # events.value ∈ [0.01, ~490]; out-of-range clamps
QSK_WIDTH = (QSK_HI - QSK_LO) / QSK_BINS   # 0.125 bin width: estimates
# land in the same bin as the floor-rank order statistic, so
# |estimate - exact(method='lower')| <= QSK_WIDTH (tested)


def qsketch_partial(values: np.ndarray) -> np.ndarray:
    """Fixed-grid histogram sketch for one batch: int64[QSK_BINS]
    counts.  Merging is elementwise SUM — fully order-independent
    (unlike t-digest/KLL, whose centroids depend on merge order), so
    results are bit-deterministic under any block schedule.  The cost
    is a fixed value range; quantile estimates share a bin with the
    floor-rank order statistic (|err| ≤ QSK_WIDTH vs method='lower';
    the rank-interpolated quantile can additionally differ by the
    local gap between adjacent order statistics)."""
    v = np.asarray(values, dtype=np.float64)
    idx = np.clip(((v - QSK_LO) / QSK_WIDTH).astype(np.int64),
                  0, QSK_BINS - 1)
    counts = np.zeros(QSK_BINS, dtype=np.int64)
    np.add.at(counts, idx, 1)
    return counts


def qsketch_merge(count_blobs) -> np.ndarray:
    out = np.zeros(QSK_BINS, dtype=np.int64)
    for blob in count_blobs:
        out += np.frombuffer(blob, dtype=np.int64)
    return out


def qsketch_quantile(counts: np.ndarray, q: float) -> float:
    """Quantile estimate: find the bin holding the q-th rank, linear
    within-bin interpolation by rank position."""
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    rank = q * (n - 1)
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, rank + 1e-9, side="left"))
    prev = int(cum[b - 1]) if b else 0
    inbin = max(int(counts[b]), 1)
    frac = (rank - prev) / inbin
    return QSK_LO + (b + min(max(frac, 0.0), 1.0)) * QSK_WIDTH
