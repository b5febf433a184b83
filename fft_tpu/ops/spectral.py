"""Spectral helpers: pruned single-position inverse rFFT and phasors."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rfft_phasor(n_fft: int, pos, dtype=jnp.complex64) -> jnp.ndarray:
    """``exp(-2j*pi*k*pos/n)`` for k = 0..n//2 — the rank-1 rFFT update term
    used by the streaming prefix-FFT cache (spectre.py:801-806)."""
    k = jnp.arange(n_fft // 2 + 1, dtype=jnp.float32)
    omega = -2.0 * np.pi / n_fft
    ang = omega * k * jnp.asarray(pos, dtype=jnp.float32)
    return (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(dtype)


def pruned_irfft_single(
    x_half: jnp.ndarray,
    n: int,
    pos,
    reference_compat: bool = False,
) -> jnp.ndarray:
    """Single output of the inverse real FFT at position ``pos`` — O(F·d)
    instead of O(N log N) (the decode fast path, spectre.py:614-655).

    x_half: (..., F_half, d) with F_half = n//2 + 1;  returns (..., d).

    The reference double-applies the Nyquist sign (spectre.py:650): its
    ``contrib[-1]`` already contains cos(pi*pos) = (-1)^pos and is multiplied
    by (-1)^pos again, so the Nyquist term always enters with + sign — wrong
    at odd positions (SURVEY §3.6-B, measured 0.055 abs error).  Default here
    is the *corrected* math (decode == forward to ~5e-6); set
    ``reference_compat=True`` to reproduce the reference bit-for-bit.
    """
    f_half = x_half.shape[-2]
    k = jnp.arange(f_half, dtype=jnp.float32)
    phase = (2.0 * np.pi / n) * k * jnp.asarray(pos, dtype=jnp.float32)
    cos_p = jnp.cos(phase)[..., :, None]
    sin_p = jnp.sin(phase)[..., :, None]
    contrib = jnp.real(x_half) * cos_p - jnp.imag(x_half) * sin_p
    result = contrib[..., 0, :]
    if n % 2 == 0:
        result = result + 2.0 * jnp.sum(contrib[..., 1:-1, :], axis=-2)
        nyq = contrib[..., -1, :]
        if reference_compat:
            sign = jnp.where((jnp.asarray(pos) % 2) == 0, 1.0, -1.0)
            nyq = nyq * sign  # cancels the cos(pi*pos) sign, as the ref does
        result = result + nyq
    else:
        result = result + 2.0 * jnp.sum(contrib[..., 1:, :], axis=-2)
    return result / n
