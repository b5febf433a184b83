"""Complex circular 1-D cross-correlation (the Toeplitz gate smoother).

Reference behavior (spectre.py:334-395 ``complex_conv1d``): circular pad by
``bw`` on both sides, then real conv1d on the (a+bi)(c+di) decomposition —
verified in SURVEY §2.1#12 to equal the naive circular cross-correlation
``y[i] = sum_m x[(i + m - bw) mod L] * k[m]``.

On TPU the kernel is tiny (2*bw+1 taps, bw=4 default) and L is small (the
gate anchor count, ~sqrt(F_half)), so a roll-based formulation beats conv
machinery and fuses completely.
"""

from __future__ import annotations

import jax.numpy as jnp


def complex_circular_conv1d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """``y[..., i] = sum_m x[..., (i + m - bw) mod L] * kernel[m]``.

    x: (..., L) complex; kernel: (K,) complex with K = 2*bw + 1 (odd).
    """
    k = kernel.shape[-1]
    assert k % 2 == 1, "kernel length must be odd (2*bw + 1)"
    bw = k // 2
    # Stack the K circular shifts: shift by (m - bw) means roll x left by
    # (m - bw)  -> jnp.roll(x, -(m - bw)).
    shifted = jnp.stack(
        [jnp.roll(x, bw - m, axis=-1) for m in range(k)], axis=-1
    )  # (..., L, K)
    return jnp.sum(shifted * kernel, axis=-1)
