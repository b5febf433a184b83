"""Complex-valued elementwise ops."""

from __future__ import annotations

import jax.numpy as jnp


def modrelu(z: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Complex modReLU: z -> ReLU(|z| + b) * z / sqrt(|z|^2 + eps^2).

    Matches the reference exactly (spectre.py:109-121): the denominator is
    the *smooth* sqrt(|z|^2 + eps^2), NOT max(|z|, eps) — this matters both
    for parity and for gradients at |z| ~ 0.  ``bias`` is a real array
    broadcastable to ``z``; reference init is -0.1 (near-identity gate,
    spectre.py:105).
    """
    mag = jnp.abs(z)
    mag_stable = jnp.sqrt(jnp.square(mag) + eps * eps)
    scale = jnp.maximum(mag + bias, 0.0) / mag_stable
    return z * scale.astype(mag.dtype)
