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
