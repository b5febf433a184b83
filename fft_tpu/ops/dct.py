"""DCT-II along the last axis, built on the real FFT (Makhoul's method).

The reference relies on the optional ``torch_dct`` package and silently
falls back to mean pooling when it is absent (spectre.py:145-155).  We build
the DCT on our own FFT path instead — no optional dependency, no fallback.

Unnormalized DCT-II (scipy/torch_dct ``norm=None`` convention):
    X_k = 2 * sum_n x_n cos(pi * k * (2n + 1) / (2N))
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dct_pool_weights(n: int, dct_components: int = 64) -> jnp.ndarray:
    """Per-position row weights ``w`` such that
    ``dct_pool(x) == sum_n x[..., n, :] * w[n]`` for length-n sequences:
    the mean of the first K unnormalized DCT-II basis rows.  Lets causal
    chunked gating compute running DCT descriptors as weighted prefix sums
    (layers/spectre.py:causal_chunk_gates) — the streaming counterpart the
    reference's DCT pooler lacks (spectre.py:136-156 has no decode path)."""
    k = np.arange(min(dct_components, n))[:, None]
    pos = np.arange(n)[None, :]
    w = 2.0 * np.cos(np.pi * k * (2 * pos + 1) / (2.0 * n))
    return jnp.asarray(w.mean(axis=0).astype(np.float32))


def dct2(x: jnp.ndarray, norm: str | None = None) -> jnp.ndarray:
    """DCT-II of ``x`` along the last axis.

    Makhoul: reorder v = [x_0, x_2, ..., x_5, x_3, x_1] (evens then reversed
    odds), FFT, then X_k = 2*Re(exp(-j*pi*k/(2N)) * V_k).
    """
    n = x.shape[-1]
    v = jnp.concatenate([x[..., ::2], x[..., 1::2][..., ::-1]], axis=-1)
    vf = jnp.fft.fft(v.astype(jnp.float32), axis=-1)
    k = jnp.arange(n, dtype=jnp.float32)
    phase = jnp.exp(-1j * (np.pi / (2.0 * n)) * k).astype(jnp.complex64)
    out = 2.0 * jnp.real(phase * vf)
    if norm == "ortho":
        scale = jnp.full((n,), 1.0, dtype=out.dtype) / jnp.sqrt(2.0 * n)
        scale = scale.at[0].set(1.0 / jnp.sqrt(4.0 * n))
        out = out * scale
    elif norm is not None:
        raise ValueError(f"Unsupported norm: {norm}")
    return out.astype(x.dtype)
