"""Complex 1-D interpolation along the last axis.

TPU-native closed-form replacement for the reference's
``F.grid_sample(mode='bicubic')`` trick (spectre.py:26-92): the same
cubic-convolution kernel (Keys, a = -0.75 — PyTorch's bicubic coefficient),
``align_corners=True`` endpoint mapping and border clamping, expressed as a
static gather + weighted sum.  Deterministic, differentiable, and fuses into
surrounding XLA ops; no image-sampling machinery needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_CUBIC_A = -0.75  # PyTorch / OpenCV cubic-convolution coefficient.


def _cubic_weight(s: np.ndarray, a: float = _CUBIC_A) -> np.ndarray:
    """Keys cubic-convolution kernel w(s) for |s| <= 2."""
    s = np.abs(s)
    w_near = ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0
    w_far = a * (((s - 5.0) * s + 8.0) * s - 4.0)
    return np.where(s <= 1.0, w_near, np.where(s < 2.0, w_far, 0.0))


@functools.lru_cache(maxsize=None)
def _interp_plan(k: int, size: int, mode: str):
    """Precompute (tap indices, tap weights) as **numpy** constants — numpy,
    not jnp, so the cache never captures a trace-scoped constant (a jnp array
    materialized inside a jit trace would leak a tracer into later traces).

    Source positions mirror the reference grid exactly: a float32
    linspace(-1, 1, size) unnormalized with align_corners=True to
    t = (g+1)/2 * (k-1)   (spectre.py:46-53).
    """
    grid = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    t = (grid.astype(np.float64) + 1.0) * 0.5 * (k - 1)
    if mode == "cubic":
        f = np.floor(t)
        frac = t - f
        # Taps f-1..f+2, each index clamped to [0, k-1] (padding_mode='border').
        idx = np.stack([f - 1, f, f + 1, f + 2], axis=-1).astype(np.int64)
        idx = np.clip(idx, 0, k - 1)
        w = np.stack(
            [
                _cubic_weight(frac + 1.0),
                _cubic_weight(frac),
                _cubic_weight(1.0 - frac),
                _cubic_weight(2.0 - frac),
            ],
            axis=-1,
        )
    elif mode == "linear":
        f = np.clip(np.floor(t), 0, k - 2) if k > 1 else np.zeros_like(t)
        frac = t - f
        idx = np.stack([f, f + 1], axis=-1).astype(np.int64)
        idx = np.clip(idx, 0, k - 1)
        w = np.stack([1.0 - frac, frac], axis=-1)
    elif mode == "nearest":
        # F.interpolate(mode='nearest') uses floor(i * k / size).
        src = np.floor(np.arange(size) * (k / size)).astype(np.int64)
        idx = np.clip(src, 0, k - 1)[:, None]
        w = np.ones((size, 1))
    else:
        raise ValueError(f"Unsupported interpolation mode: {mode}")
    return idx, w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(k: int, size: int, mode: str) -> np.ndarray:
    """The interpolation as a dense (k, size) matrix: out = x @ M.  On TPU a
    tiny matmul beats the 4-tap gather by a wide margin (MXU vs scattered
    VPU loads) whenever k is small, which it always is here (k = number of
    gate anchors ~ sqrt(F_half))."""
    idx, w = _interp_plan(k, size, mode)
    m = np.zeros((k, size), np.float32)
    for t in range(size):
        for tap in range(idx.shape[1]):
            m[idx[t, tap], t] += w[t, tap]
    return m


def interp_complex_1d(x: jnp.ndarray, size: int, mode: str = "cubic") -> jnp.ndarray:
    """Interpolate ``x (..., K)`` (complex or real) to ``(..., size)``.

    Endpoint-exact (anchor 0 -> bin 0, anchor K-1 -> bin size-1), matching
    the reference behavior verified in SURVEY §2.1#2.
    """
    k = x.shape[-1]
    if k <= 256:
        m = jnp.asarray(_interp_matrix_np(k, size, mode))
        return x @ m.astype(jnp.real(x).dtype)
    idx_np, w_np = _interp_plan(k, size, mode)
    idx, w = jnp.asarray(idx_np), jnp.asarray(w_np)
    taps = jnp.take(x, idx, axis=-1)            # (..., size, n_taps)
    w = w.astype(jnp.real(taps).dtype)
    return jnp.sum(taps * w, axis=-1)


def interp_complex_1d_ref_compat(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Reproduce the reference's *cubic* path bit-for-bit, including its
    latent real/imag scrambling bug.

    spectre.py:42 stacks real/imag at dim 1 of ``(B, G, K)`` and then
    reshapes ``(B, 2, G, K) -> (B*G, 2, 1, K)``: for G > 1 this re-pairs the
    grid_sample channels so the "complex" output at group m is
    ``S_up[2m] + i*S_up[2m+1]`` where S = [Re(g0..g_{G-1}); Im(g0..g_{G-1})]
    row-stacked — e.g. for G=4 group 0 becomes Re(g0) + i*Re(g1).  Each real
    plane is still interpolated correctly; only the complex pairing is
    permuted, so the reference trains through it.  Identity to the intended
    math when G == 1.  Default layers use the intended complex
    interpolation; this exists for golden parity (see also SURVEY §3.6).

    x: (..., G, K) complex -> (..., G, size) complex.
    """
    stacked = jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=-2)
    up = interp_complex_1d(stacked, size, "cubic")   # real-plane interp
    return jax.lax.complex(up[..., 0::2, :], up[..., 1::2, :])
