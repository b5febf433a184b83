"""Haar wavelet pyramid along the last axis.

The reference's DWT/IDWT (spectre.py:181-328) is NOT a perfect-reconstruction
pair: its analysis uses a circular left-pad-by-1 (so lo[i] pairs x[2i-1] with
x[2i]) while its synthesis interleaves aligned pairs — SURVEY §3.6-D measured
a 1-level roundtrip error of ~4.6 on unit-normal input, and its multi-level
pyramid crashes whenever a level has odd length (e.g. ViT's L=197).

We provide:
- the default **perfect-reconstruction** orthonormal Haar pair with
  arbitrary-length support (odd levels zero-padded, lengths recorded, exact
  roundtrip), and
- ``reference_compat=True`` reproducing the reference conv arithmetic
  exactly (for golden parity on power-of-two lengths).

All functions operate on the last axis and are shape-static (jit friendly).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def haar_dwt_level(
    x: jnp.ndarray, reference_compat: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One analysis level: ``x (..., L) -> (lo, hi)`` each ``(..., L') ``.

    PR mode: lo[i] = (x[2i] + x[2i+1])/sqrt2, hi[i] = (x[2i] - x[2i+1])/sqrt2,
    with odd L zero-padded to even (L' = ceil(L/2)).

    reference_compat: circular pad-by-1 arithmetic of spectre.py:202-214 —
    lo[i] = (x[(2i-1) mod L] + x[2i])/sqrt2, hi[i] = (-x[(2i-1) mod L] +
    x[2i])/sqrt2, trimmed to L' = L//2 on odd L.
    """
    length = x.shape[-1]
    if reference_compat:
        xm1 = jnp.roll(x, 1, axis=-1)
        even = x[..., ::2]
        prev = xm1[..., ::2]
        lo = (prev + even) * _INV_SQRT2
        hi = (even - prev) * _INV_SQRT2
        out_len = length // 2
        return lo[..., :out_len], hi[..., :out_len]
    if length % 2:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
        x = jnp.pad(x, pad)
    pairs = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    lo = (pairs[..., 0] + pairs[..., 1]) * _INV_SQRT2
    hi = (pairs[..., 0] - pairs[..., 1]) * _INV_SQRT2
    return lo, hi


def haar_idwt_level(
    lo: jnp.ndarray, hi: jnp.ndarray, out_len: Optional[int] = None
) -> jnp.ndarray:
    """One synthesis level, the exact inverse of the PR analysis.

    y[2i] = (lo[i] + hi[i])/sqrt2, y[2i+1] = (lo[i] - hi[i])/sqrt2 — this is
    also what the reference's conv_transpose arithmetic computes
    (spectre.py:261-271), so it serves both modes; only the analysis differs.
    ``out_len`` trims zero-pad introduced for odd lengths.
    """
    even = (lo + hi) * _INV_SQRT2
    odd = (lo - hi) * _INV_SQRT2
    y = jnp.stack([even, odd], axis=-1).reshape(*lo.shape[:-1], 2 * lo.shape[-1])
    if out_len is not None:
        y = y[..., :out_len]
    return y


def haar_decompose(
    x: jnp.ndarray,
    levels: Optional[int] = None,
    reference_compat: bool = False,
) -> Tuple[List[jnp.ndarray], List[int]]:
    """Full pyramid: returns ([hi_0, hi_1, ..., approx], input-length-per-level).

    Matches the reference's structure (spectre.py:291-314): detail
    coefficients per level followed by the final approximation; default depth
    int(log2(L)), stopping once a level has length <= 1.
    """
    length = x.shape[-1]
    if levels is None:
        levels = max(int(math.log2(length)), 1)
    coeffs: List[jnp.ndarray] = []
    lengths: List[int] = []
    cur = x
    for _ in range(levels):
        lengths.append(cur.shape[-1])
        lo, hi = haar_dwt_level(cur, reference_compat=reference_compat)
        coeffs.append(hi)
        cur = lo
        if cur.shape[-1] <= 1:
            break
    coeffs.append(cur)
    return coeffs, lengths


def haar_reconstruct(
    coeffs: Sequence[jnp.ndarray], lengths: Sequence[int]
) -> jnp.ndarray:
    """Inverse pyramid.  Exact inverse of ``haar_decompose`` in PR mode
    (roundtrip error ~ float eps for any length); in reference_compat mode it
    reproduces the reference's (lossy) reconstruction arithmetic."""
    x = coeffs[-1]
    for i in range(len(coeffs) - 2, -1, -1):
        x = haar_idwt_level(x, coeffs[i], out_len=lengths[i])
    return x
