"""Fused Pallas kernel for the segmented causal mix's hot loop.

The jnp segmented path (layers/causal_seg.py) re-reads the segment spectra
nc times (once per banded term) and round-trips the summed spectrum through
HBM before the inverse FFT.  This kernel runs the banded sum AND the
inverse transform in VMEM:

  grid = (batch, d/128, chunk, f2-block), frequency-block innermost:

  per (b, dblk, c, fb):
    acc(FB, 128)  = sum_{j<=c} expand(K[c, j, fb]) (.) V[c-j, fb]
    o_c(C, 128)  += A[:, fb]_r @ Re(acc) + A[:, fb]_i @ Im(acc)

  The banded sum is pointwise per frequency, and the partial irFFT
  contracts frequencies linearly — so the f2 axis splits into VMEM-sized
  blocks accumulated into the (VMEM-resident) output block across the
  innermost grid steps.  This removes round 1's hard VMEM ceiling (seq
  >= 4096 used to fall back to the ~30 ms jnp path): any (nc, f2) now
  runs fused.  When f2 fits in one block (seq <= ~2048) the index maps
  are fb-invariant and the spectra block stays RESIDENT across all nc
  chunk steps — exactly the round-1 kernel, read-V-once behavior.

A_r/A_i bake the irfft normalization, the 2x mid-bin weights, and the
DC/Nyquist imaginary-drop convention, evaluated only at output positions
C..2C-1 — so the "inverse FFT" is a single (C, FB) x (FB, 128) matmul pair
per frequency block.

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
# Resident-block budget per spectra plane.  The default XLA scoped-vmem
# limit is 16 MB, but the v5e physically has 128 MB and accepts
# vmem_limit_bytes raises (probed: 64 MB scratch + 64 MB operand compile
# and run) — both pallas_calls below pass _VMEM_LIMIT explicitly.
_VMEM_BLOCK = 16 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024
# Tests on CPU set this to run through the Pallas interpreter.
INTERPRET = False


def _fb_plan(nc: int, f2: int) -> Tuple[int, int]:
    """(FB, nf): frequency-block rows per grid step and number of blocks."""
    chunk = f2 - 1
    pad8 = -(-f2 // 8) * 8
    # V/K block: nc * FB * 128 lanes * 4 B * 2 planes; A block: C * FB * 8 B.
    fb_v = _VMEM_BLOCK // (nc * _DBLK * 4 * 2)
    fb_a = (2 * 1024 * 1024) // (max(chunk, 1) * 8)
    fb_max = max(8, min(fb_v, fb_a) // 8 * 8)
    if pad8 <= fb_max:
        return pad8, 1
    # blocked sweep: FB is then the LAST dim of the A blocks, which Mosaic
    # requires to be a multiple of 128 (a full-width block is exempt above)
    fb = max(128, fb_max // 128 * 128)
    return fb, -(-f2 // fb)


def banded_supported(nc: int, f2: int) -> bool:
    """The f2-blocked kernel handles any frequency count; remaining bounds
    are the output block (chunk rows of 128 lanes, VMEM-resident across the
    f2 sweep) and a sanity cap on the banded width."""
    chunk = f2 - 1
    return chunk <= 8192 and nc <= 128


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


def _make_kernel(nc: int, fb_rows: int, nf: int, chunk: int, cols: int,
                 precision):
    def kernel(vfr_ref, vfi_ref, kfr_ref, kfi_ref, e_ref, ar_ref, ai_ref,
               o_ref, kr_scr, ki_scr):
        c = pl.program_id(2)
        e = e_ref[0]                                   # (cols, 128)
        ar = ar_ref[:]                                 # (C, FB)
        ai = ai_ref[:]

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        # expand ALL kernel segments' compact columns to channel lanes in
        # ONE tall matmul (per-j (FB, cols) expands strand the MXU), staged
        # into VMEM scratch so the banded loop can pl.ds-slice a REF
        # (Mosaic has no dynamic_slice on values)
        kr_scr[:] = mm(kfr_ref[0, 0].reshape(nc * fb_rows, cols), e)
        ki_scr[:] = mm(kfi_ref[0, 0].reshape(nc * fb_rows, cols), e)

        def body(jj, carry):
            accr, acci = carry
            gr = kr_scr[pl.ds(jj * fb_rows, fb_rows)]
            gi = ki_scr[pl.ds(jj * fb_rows, fb_rows)]
            s = jnp.maximum(c - jj, 0)
            vr = vfr_ref[0, pl.ds(s, 1)][0]            # (FB, 128)
            vi = vfi_ref[0, pl.ds(s, 1)][0]
            take = jnp.where(jj <= c, 1.0, 0.0)
            accr = accr + take * (gr * vr - gi * vi)
            acci = acci + take * (gr * vi + gi * vr)
            return accr, acci

        zero = jnp.zeros((fb_rows, _DBLK), jnp.float32)
        accr, acci = jax.lax.fori_loop(0, nc, body, (zero, zero))
        y = mm(ar, accr) + mm(ai, acci)                # (C, 128)
        if nf == 1:
            o_ref[0, 0] = y.astype(o_ref.dtype)
        else:
            fb = pl.program_id(3)

            @pl.when(fb == 0)
            def _():
                o_ref[0, 0] = y.astype(o_ref.dtype)

            @pl.when(fb > 0)
            def _():
                o_ref[0, 0] = o_ref[0, 0] + y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "fast", "interpret"))
def _banded_inverse_call(vfr, vfi, kfr, kfi, *, chunk, fast=False,
                         interpret=False):
    b, nc, f2, d = vfr.shape
    cols = kfr.shape[-1]
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    fb_rows, nf = _fb_plan(nc, f2)
    kernel = _make_kernel(nc, fb_rows, nf, chunk, cols, precision)
    ar, ai = _inv_rows_np(chunk)

    # zero-pad the frequency axis to nf * FB (zero rows contribute nothing;
    # the A columns for padded rows are zero too)
    fpad = nf * fb_rows
    if fpad > f2:
        pf = fpad - f2
        vfr = jnp.pad(vfr, ((0, 0), (0, 0), (0, pf), (0, 0)))
        vfi = jnp.pad(vfi, ((0, 0), (0, 0), (0, pf), (0, 0)))
        kfr = jnp.pad(kfr, ((0, 0), (0, 0), (0, 0), (0, pf), (0, 0)))
        kfi = jnp.pad(kfi, ((0, 0), (0, 0), (0, 0), (0, pf), (0, 0)))
        ar = np.pad(ar, ((0, 0), (0, pf)))
        ai = np.pad(ai, ((0, 0), (0, pf)))

    d_per_col = d // cols
    e = np.zeros((d // _DBLK, cols, _DBLK), np.float32)
    for j in range(d // _DBLK):
        for l in range(_DBLK):
            e[j, (j * _DBLK + l) // d_per_col, l] = 1.0

    # chunk axis before the f2-block axis: the output block (invariant in
    # fb) accumulates in VMEM across the inner fb sweep; with nf == 1 the
    # spectra blocks are grid-invariant past (b, dblk) and stay resident.
    grid = (b, d // _DBLK, nc, nf)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, nc, chunk, d), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, nc, fb_rows, _DBLK),
                         lambda i, j, c, fb: (i, 0, fb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, fb_rows, _DBLK),
                         lambda i, j, c, fb: (i, 0, fb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, fb_rows, cols),
                         lambda i, j, c, fb: (i, c, 0, fb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc, fb_rows, cols),
                         lambda i, j, c, fb: (i, c, 0, fb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, _DBLK), lambda i, j, c, fb: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, fb_rows), lambda i, j, c, fb: (0, fb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, fb_rows), lambda i, j, c, fb: (0, fb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, _DBLK),
                               lambda i, j, c, fb: (i, c, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nc * fb_rows, _DBLK), jnp.float32),
            pltpu.VMEM((nc * fb_rows, _DBLK), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
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
