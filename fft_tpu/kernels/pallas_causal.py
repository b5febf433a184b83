"""Fused Pallas kernel for the segmented causal mix's hot loop.

The jnp segmented path (layers/causal_seg.py) re-reads the segment spectra
nc times (once per banded term) and round-trips the summed spectrum through
HBM before the inverse FFT.  This kernel runs the banded sum AND the
inverse transform in VMEM:

  grid = (batch, d/128, chunk) with the chunk axis innermost: the segment
  spectra block's index map is invariant in the chunk dimension, so Mosaic
  keeps it RESIDENT in VMEM across all nc chunk steps — the spectra are
  read from HBM once instead of nc times.

  per (b, dblk, c):
    acc(f2, 128)  = sum_{j<=c} expand(K[c, j]) (.) V[c-j]     (VPU + one-hot
                                                               MXU expand)
    y_c(C, 128)   = A_r @ Re(acc) + A_i @ Im(acc)             (dense partial
                                                               irFFT: only
                                                               the last C of
                                                               the 2C output
                                                               are needed)

A_r/A_i bake the irfft normalization, the 2x mid-bin weights, and the
DC/Nyquist imaginary-drop convention, evaluated only at output positions
C..2C-1 — so the "inverse FFT" is a single (C, F2) x (F2, 128) matmul pair.

Differentiable via custom_vjp against the jnp banded composition (the op is
bilinear in (V, K), so that VJP is the exact adjoint).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DBLK = 128
# Tests on CPU set this to run through the Pallas interpreter.
INTERPRET = False


def banded_supported(nc: int, f2: int) -> bool:
    """VMEM bound for the resident spectra block (nc, F2, 128) x re/im f32.
    Empirical compile ceiling on v5e: 2.1 MB blocks compile, 4.2 MB do not
    (Mosaic double-buffers; plus kernel-segment and output blocks)."""
    return nc * f2 * _DBLK * 4 * 2 <= 3 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _inv_rows_np(chunk: int) -> Tuple[np.ndarray, np.ndarray]:
    """(C, F2) partial-irfft matrices for output rows C..2C-1 of irfft_2C."""
    n = 2 * chunk
    f2 = chunk + 1
    t = np.arange(chunk, 2 * chunk)[:, None]
    k = np.arange(f2)[None, :]
    coef = np.full(f2, 2.0)
    coef[0] = 1.0
    coef[-1] = 1.0
    ang = 2.0 * np.pi * k * t / n
    ar = (coef * np.cos(ang) / n).astype(np.float32)
    ai = (-coef * np.sin(ang) / n).astype(np.float32)
    ai[:, 0] = 0.0                      # irfft drops Im at DC
    ai[:, -1] = 0.0                     # ... and Nyquist
    return ar, ai


def _make_kernel(nc: int, f2: int, chunk: int, cols: int, precision):
    def kernel(vfr_ref, vfi_ref, kfr_ref, kfi_ref, e_ref, ar_ref, ai_ref,
               o_ref):
        c = pl.program_id(2)
        e = e_ref[0]                                   # (cols, 128)
        ar = ar_ref[:]                                 # (C, F2)
        ai = ai_ref[:]

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        def body(jj, carry):
            accr, acci = carry
            kr = kfr_ref[0, 0, pl.ds(jj, 1)][0]        # (F2, cols)
            ki = kfi_ref[0, 0, pl.ds(jj, 1)][0]
            s = jnp.maximum(c - jj, 0)
            vr = vfr_ref[0, pl.ds(s, 1)][0]            # (F2, 128)
            vi = vfi_ref[0, pl.ds(s, 1)][0]
            gr = mm(kr, e)                             # expand cols -> lanes
            gi = mm(ki, e)
            take = jnp.where(jj <= c, 1.0, 0.0)
            accr = accr + take * (gr * vr - gi * vi)
            acci = acci + take * (gr * vi + gi * vr)
            return accr, acci

        zero = jnp.zeros((f2, _DBLK), jnp.float32)
        accr, acci = jax.lax.fori_loop(0, nc, body, (zero, zero))
        y = mm(ar, accr) + mm(ai, acci)                # (C, 128)
        o_ref[0, 0] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "fast", "interpret"))
def _banded_inverse_call(vfr, vfi, kfr, kfi, *, chunk, fast=False,
                         interpret=False):
    b, nc, f2, d = vfr.shape
    cols = kfr.shape[-1]
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    kernel = _make_kernel(nc, f2, chunk, cols, precision)
    ar, ai = _inv_rows_np(chunk)

    d_per_col = d // cols
    e = np.zeros((d // _DBLK, cols, _DBLK), np.float32)
    for j in range(d // _DBLK):
        for l in range(_DBLK):
            e[j, (j * _DBLK + l) // d_per_col, l] = 1.0

    grid = (b, d // _DBLK, nc)          # chunk innermost: vf stays resident
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, nc, chunk, d), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, nc, f2, _DBLK), lambda i, j, c: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, f2, _DBLK), lambda i, j, c: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, f2, cols),
                         lambda i, j, c: (i, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, f2, cols),
                         lambda i, j, c: (i, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, _DBLK), lambda i, j, c: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ar.shape, lambda i, j, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ai.shape, lambda i, j, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, _DBLK),
                               lambda i, j, c: (i, c, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vfr, vfi, kfr, kfi, jnp.asarray(e), jnp.asarray(ar), jnp.asarray(ai))
    return out


def _banded_inverse_ref(vfr, vfi, kfr, kfi, chunk):
    """jnp reference of the same banded sum + partial irfft (for the VJP
    and correctness tests)."""
    b, nc, f2, d = vfr.shape
    cols = kfr.shape[-1]
    d_g = d // cols
    vr = vfr.reshape(b, nc, f2, cols, d_g)
    vi = vfi.reshape(b, nc, f2, cols, d_g)
    accr = jnp.zeros_like(vr)
    acci = jnp.zeros_like(vi)
    for j in range(nc):
        kr = kfr[:, :, j][..., None]                   # (b, c, f2, cols, 1)
        ki = kfi[:, :, j][..., None]
        pad = ((0, 0), (j, 0), (0, 0), (0, 0), (0, 0))
        vrj = jnp.pad(vr, pad)[:, :nc]
        vij = jnp.pad(vi, pad)[:, :nc]
        accr = accr + kr * vrj - ki * vij
        acci = acci + kr * vij + ki * vrj
    ar, ai = _inv_rows_np(chunk)
    accr = accr.reshape(b, nc, f2, d)
    acci = acci.reshape(b, nc, f2, d)
    return (jnp.einsum("tf,bcfd->bctd", jnp.asarray(ar), accr)
            + jnp.einsum("tf,bcfd->bctd", jnp.asarray(ai), acci))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def banded_inverse(vfr, vfi, kfr, kfi, chunk: int, fast: bool = False,
                   interpret: bool = False):
    """y (B, nc, C, d) = partial_irfft( sum_j K[c,j] (.) V[c-j] ).

    vfr/vfi: (B, nc, F2, d) segment spectra; kfr/kfi: (B, nc_c, nc_j, F2,
    cols) compact kernel-segment spectra (cols = head-groups)."""
    return _banded_inverse_call(vfr, vfi, kfr, kfi, chunk=chunk, fast=fast,
                                interpret=interpret)


def _bi_fwd(vfr, vfi, kfr, kfi, chunk, fast, interpret):
    return banded_inverse(vfr, vfi, kfr, kfi, chunk, fast, interpret), (
        vfr, vfi, kfr, kfi)


def _bi_bwd(chunk, fast, interpret, res, ybar):
    vfr, vfi, kfr, kfi = res
    _, vjp = jax.vjp(
        lambda a, b, c, d: _banded_inverse_ref(a, b, c, d, chunk),
        vfr, vfi, kfr, kfi)
    return vjp(ybar)


banded_inverse.defvjp(_bi_fwd, _bi_bwd)
