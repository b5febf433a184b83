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
_VMEM_LIMIT = 116 * 1024 * 1024
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


@functools.lru_cache(maxsize=None)
def _fwd_rows_np(chunk: int) -> Tuple[np.ndarray, np.ndarray]:
    """(F2, 2C) dense rFFT matrices: X = (mfr + i mfi) @ seg transforms a
    real 2C-point segment along rows, natural bin order 0..C (row C is the
    Nyquist bin, mfi[C] == 0).  Replaces the packed-complex staged DFT in
    the v2 forward's segment stage: the staged form's pack reshape +
    twiddle + untangle are ~10 VPU passes over (C, 2*dblk) per segment,
    which bound the kernel the same way they bound the non-causal staged
    mix (pallas_fft.py's direct-kernel note: VPU, not HBM, limits it to
    ~27% of roofline at N=1024).  Dense rows cost more MXU FLOPs but zero
    VPU work and no relayout."""
    c2 = 2 * chunk
    k = np.arange(chunk + 1)[:, None]
    t = np.arange(c2)[None, :]
    ang = -2.0 * np.pi * k * t / c2
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


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


def _banded_inverse_ref(vfr, vfi, kfr, kfi, chunk,
                        precision=jax.lax.Precision.HIGHEST):
    """jnp reference of the same banded sum + partial irfft (for the VJP
    and correctness tests).  ``precision`` must default to HIGHEST: an
    unqualified einsum runs ONE bf16 pass on TPU, which would silently
    degrade both exact-mode comparisons and the custom-VJP gradients."""
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
    return (jnp.einsum("tf,bcfd->bctd", jnp.asarray(ar), accr,
                       precision=precision)
            + jnp.einsum("tf,bcfd->bctd", jnp.asarray(ai), acci,
                         precision=precision))


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


# ---------------------------------------------------------------------------
# v2: whole causal mix fused — segment rFFTs + banded sum + partial irFFT
# in ONE kernel that reads raw values once (replaces spectre.py:506-551's
# per-chunk torch.fft round trips AND round 1's separate 5 ms matmul-FFT
# segment-spectra pass).
#
#   grid = (batch, d/128, delta), delta (= segment lag) innermost:
#     delta == 0   : FFT all nc segments of the resident v slab into VMEM
#                    scratch (stage order + a Nyquist row per segment)
#     every delta  : acc[c] += sel_c(K[delta]) (.) V[c - delta]
#                    (ONE static-shift slab multiply-add over all chunks —
#                    no per-chunk masking, no dynamic gathers)
#     delta == nc-1: y[c] = A_r @ acc_r[c] + A_i @ acc_i[c]  (partial irFFT
#                    evaluated only at output rows C..2C-1), written once.
#
# K arrives in the PRODUCER's layout (B, j, F2, nc_c*cols) — exactly what
# the lane-folded kernel-segment FFT pipeline emits — so no host-side
# (j, F2, c) -> (c, j, F2) relayout exists at all (measured ~5 ms of XLA
# transpose+pad at seq 8k).  Per banded term the kernel selects chunk c's
# column group and expands it to channel lanes with two small one-hot
# matmuls (P then E) — ~0.3 ms of extra MXU work at seq 8k, fully
# overlapped.
#
# V spectra live in an (nc*f2p, 128) scratch; the banded loop starts at
# c = delta so every shifted read c - delta stays in range.
# ---------------------------------------------------------------------------


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _fused_vmem_ok(nc: int, chunk: int, dblk: int, itemsize: int = 4,
                   scr_bf16: bool = False, staged: bool = False,
                   cols: int = 32, dense_fwd: bool = False) -> bool:
    """Models the Mosaic VMEM layout exactly enough to predict compile OOM
    (verified against the compiler's own report on v5e): every operator
    window gets TWO buffering levels, lane dims pad to 128, the hardware
    has 128 MB; leave headroom for constants/spills."""
    f2p = _pad8(chunk + 1)
    n = nc * chunk
    ncg = nc * cols                              # K lane count (H*G)
    scr_item = 2 if scr_bf16 else 4
    vin = (n + chunk) * dblk * itemsize * 2      # v window, double-buffered
    out = n * dblk * itemsize * 2                # y window
    kblk = f2p * max(ncg, 128) * scr_item * 2 * 2  # K slab planes per delta
    psel = nc * ncg * max(32, 128) * 4           # P selector (resident)
    vscr = nc * f2p * dblk * scr_item * 2        # V spectra scratch
    acc = nc * f2p * dblk * scr_item * 2         # accumulators
    if staged:
        # staged inverse: no dense A windows; ~6 live (C, 2*dblk) f32
        # stage buffers inside the out loop instead
        amat = 6 * chunk * 2 * dblk * 4
    else:
        # A_r/A_i windows.  The x1.36 calibration is empirical: Mosaic's
        # real allocation for the big resident dense matrices runs well
        # above 2-level buffering (dense/128 at nc=4, chunk=2048 measured
        # 116.6 MiB on chip where the unscaled model said 93.6).
        amat = int(chunk * f2p * 4 * 2 * 2 * 1.36)
    # dense segment-FFT rows: two resident (f2p, 2C) f32 matrices.  NO
    # double-buffer/calibration factor: with it the model rejects
    # (nc=4, chunk=1024, dblk=256), which compiles and runs on chip
    # (1.97 ms, 2026-08-19) — constant windows are held once
    fmat = f2p * 2 * chunk * 4 * 2 if dense_fwd else 0
    total = vin + out + kblk + psel + vscr + acc + amat + fmat
    # 96 MB: the compiler's real allocation runs ~13% above this model
    # (measured 120.2 MB where the model said 106 at nc=4, chunk=2048),
    # and the scoped limit is 116 MB — keep that much slack.
    return total < 96 * 1024 * 1024


def _fused_plan(nc: int, chunk: int, d: int, itemsize: int = 2,
                fast: bool = False, cols: int = 32):
    """(dblk, staged, scr_bf16, dense_fwd) for the v2 forward kernel, or
    None.

    Preference order, all measured on v5e:
    1. exact f32 scratch before the fast-mode bf16-scratch variant;
    2. DENSE segment-FFT rows before the packed staged DFT — the staged
       form's pack reshape + twiddle + untangle are ~10 VPU passes per
       segment that dominate the kernel at chunk 256-1024 (measured
       2026-08-19, mix-only ms: chunk 256 2.92 -> 0.86, chunk 512
       2.53 -> 1.31 @dblk 512, chunk 1024 2.48 -> 1.97 @dblk 256; even
       chunk 128 ties-or-wins 1.19 -> 1.10).  Dense loses only VMEM: the
       (F2, 2C) row pair never fits at chunk 2048, where staged remains;
    3. DENSE partial-irFFT output stage before the staged inverse (seq 8k
       / chunk 2048: dense/128 3.08 ms vs staged/256 3.68 / staged/128
       4.70); staged's role is to FIT shapes whose dense A matrices blow
       the VMEM budget (chunk 2048 at nc >= 8, the 16k/32k configs);
    4. wider channel blocks first (fewer programs, one K expansion per
       (b, delta) instead of per block, contiguous HBM reads of v).
    """
    scr_opts = (False,) if not fast else (False, True)
    # dense_fwd capped at chunk 1024: the (F2, 2C) pair is 67 MB at chunk
    # 2048 and the compiler OOM'd scoped VMEM there (2026-08-19) even when
    # the byte model squeaked under; 2048 was never a dense win candidate
    dense_opts = (True, False) if chunk <= 1024 else (False,)
    for scr in scr_opts:
        for dense_fwd in dense_opts:
            for staged in (False, True):
                for dblk in (512, 256, 128):
                    if d % dblk or dblk > d:
                        continue
                    if _fused_vmem_ok(nc, chunk, dblk, itemsize, scr,
                                      staged, cols, dense_fwd):
                        return dblk, staged, scr, dense_fwd
    return None


def fused_mix_supported(nc: int, chunk: int, d: int,
                        fast: bool = True, cols: int = 32) -> bool:
    """VMEM-budget + plan predicate for the v2 fused causal kernel.
    ``fast`` additionally admits shapes that only fit with the bf16
    scratch variant (long-context 32k shapes)."""
    from fft_tpu.kernels.pallas_fft import _mix_factors
    if d % _DBLK or chunk % 8 or not 128 <= chunk <= 2048 or not nc >= 1:
        return False
    if nc > 64 or _mix_factors(2 * chunk) is None:
        return False
    return (_fused_plan(nc, chunk, d, 2, fast, cols) is not None
            or _fused_plan_v3(nc, chunk, d, 2, fast, cols) is not None)


def _make_fused_kernel(nc: int, chunk: int, cols: int, precision,
                       dblk: int, scr_bf16: bool = False,
                       staged: bool = False, dense_fwd: bool = False):
    import fft_tpu.kernels.pallas_fft as pf
    cst = pf._consts(2 * chunk)
    n2, f1, f2d = cst["n2"], cst["f1"], cst["f2"]
    assert n2 == chunk
    f2p = _pad8(n2 + 1)
    ncg = nc * cols
    b0r, b0i = cst["b0"].real, cst["b0"].imag
    sdt = jnp.bfloat16 if scr_bf16 else jnp.float32

    def kernel(v_ref, kr_ref, ki_ref, p_ref, e_ref, *rest):
        if staged:
            (i1r_ref, i1i_ref, itwr_ref, itwi_ref, i2r_ref, i2i_ref,
             airp_ref, aiip_ref, cirp_ref, ciip_ref, dc_ref) = rest[:11]
            rest = rest[11:]
        else:
            ar_ref, ai_ref = rest[:2]
            rest = rest[2:]
        if dense_fwd:
            mfr_ref, mfi_ref = rest[:2]
            rest = rest[2:]
        else:
            (w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
             afr_ref, afi_ref, bfr_ref, bfi_ref) = rest[:10]
            rest = rest[10:]
        o_ref, vr_scr, vi_scr, accr, acci = rest
        delta = pl.program_id(2)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        @pl.when(delta == 0)
        def _():
            zero = jnp.zeros((nc * f2p, dblk), sdt)
            vr_scr[:] = zero
            vi_scr[:] = zero
            accr[:] = zero
            acci[:] = zero
            if dense_fwd:
                # dense (f2p, 2C) rFFT rows: two MXU matmuls per segment,
                # no pack reshape / twiddle / untangle VPU passes; pad rows
                # of the matrices are zero so the scratch pad rows stay 0
                mfr, mfi = mfr_ref[:], mfi_ref[:]

                def seg_body(s, carry):
                    seg = v_ref[0, pl.ds(s * chunk, 2 * chunk)].astype(
                        jnp.float32)                 # (2C, 128)
                    base = s * f2p
                    vr_scr[pl.ds(base, f2p)] = mm(mfr, seg).astype(sdt)
                    vi_scr[pl.ds(base, f2p)] = mm(mfi, seg).astype(sdt)
                    return carry
            else:
                w1r, w1i = w1r_ref[:], w1i_ref[:]
                twr, twi = twr_ref[:], twi_ref[:]
                w2r, w2i = w2r_ref[:], w2i_ref[:]
                afr, afi = afr_ref[:], afi_ref[:]
                bfr, bfi = bfr_ref[:], bfi_ref[:]

                def seg_body(s, carry):
                    seg = v_ref[0, pl.ds(s * chunk, 2 * chunk)].astype(
                        jnp.float32)                 # (2C, 128)
                    zs = seg.reshape(n2, 2 * dblk)   # [z_re | z_im] lanes
                    fsr, fsi = pf.staged_dft(zs, None, w1r, w1i, twr, twi,
                                             w2r, w2i, f1, f2d, precision)
                    frr, fir = fsr[:, :dblk], fsr[:, dblk:]
                    fri, fii = fsi[:, :dblk], fsi[:, dblk:]
                    pr = frr - fii
                    pi = fri + fir
                    zcr = frr + fii
                    zci = fri - fir
                    xr = afr * pr - afi * pi + bfr * zcr - bfi * zci
                    xi = afr * pi + afi * pr + bfr * zci + bfi * zcr
                    x_nyq = jnp.sum(zs[:, :dblk] - zs[:, dblk:], axis=0,
                                    keepdims=True)
                    base = s * f2p
                    vr_scr[pl.ds(base, n2)] = xr.astype(sdt)
                    vi_scr[pl.ds(base, n2)] = xi.astype(sdt)
                    vr_scr[pl.ds(base + n2, 1)] = x_nyq.astype(sdt)
                    return carry

            jax.lax.fori_loop(0, nc, seg_body, 0)

        # banded accumulation, streamed per destination chunk: bounds the
        # live set to ~6 (f2p, dblk) values (a whole-slab version spilled
        # ~45 MB of registers), and starts at c = delta — terms with
        # c < delta hit the zero region and are skipped outright.
        e = e_ref[0]                                  # (cols, dblk) one-hot
        # this delta's K slab in producer layout, F2 rows padded to f2p
        kslab_r = jnp.pad(kr_ref[0, 0], ((0, f2p - n2 - 1), (0, 0)))
        kslab_i = jnp.pad(ki_ref[0, 0], ((0, f2p - n2 - 1), (0, 0)))

        def delta_body(c, carry):
            pc = p_ref[pl.ds(c * ncg, ncg)]           # (ncG, cols) one-hot
            gr = mm(mm(kslab_r, pc), e)               # (f2p, dblk) f32
            gi = mm(mm(kslab_i, pc), e)
            voff = (c - delta) * f2p
            vr = vr_scr[pl.ds(voff, f2p)].astype(jnp.float32)
            vi = vi_scr[pl.ds(voff, f2p)].astype(jnp.float32)
            aoff = c * f2p
            accr[pl.ds(aoff, f2p)] = (
                accr[pl.ds(aoff, f2p)].astype(jnp.float32)
                + (gr * vr - gi * vi)).astype(sdt)
            acci[pl.ds(aoff, f2p)] = (
                acci[pl.ds(aoff, f2p)].astype(jnp.float32)
                + (gr * vi + gi * vr)).astype(sdt)
            return carry

        jax.lax.fori_loop(delta, nc, delta_body, 0)

        @pl.when(delta == nc - 1)
        def _():
            # fori (not unrolled): a static unroll at nc=16 spilled ~47 MB
            # of registers and blew the 128 MB VMEM budget
            if staged:
                # staged inverse via the delay identity: y_c = first C rows
                # of irfft_2C((-1)^k (.) acc_c); the (-1)^k sign is folded
                # into the A'/C' untangle rows host-side.
                i1r, i1i = i1r_ref[:], i1i_ref[:]
                itwr, itwi = itwr_ref[:], itwi_ref[:]
                i2r, i2i = i2r_ref[:], i2i_ref[:]
                airp, aiip = airp_ref[:], aiip_ref[:]
                cirp, ciip = cirp_ref[:], ciip_ref[:]
                dc = dc_ref[:]

                def out_body(c, carry):
                    base = c * f2p
                    mr = accr[pl.ds(base, n2)].astype(jnp.float32)
                    mi = acci[pl.ds(base, n2)].astype(jnp.float32) * (
                        1.0 - dc)
                    m_nyq = accr[pl.ds(base + n2, 1)].astype(jnp.float32)
                    amr = airp * mr - aiip * mi
                    ami = airp * mi + aiip * mr
                    cmr = cirp * mr + ciip * mi       # C' (.) conj(M)
                    cmi = ciip * mr - cirp * mi
                    sr = jnp.concatenate([amr, cmr], axis=-1)
                    si = jnp.concatenate([ami, -cmi], axis=-1)
                    tr, ti = pf.staged_dft(sr, si, i1r, i1i, itwr, itwi,
                                           i2r, i2i, f1, f2d, precision)
                    z_r = tr[:, :dblk] + tr[:, dblk:] + b0r * m_nyq
                    z_i = ti[:, :dblk] - ti[:, dblk:] + b0i * m_nyq
                    # y[2m] = z_r[m], y[2m+1] = z_i[m]; keep rows 0..C-1
                    y = jnp.stack([z_r[:n2 // 2], z_i[:n2 // 2]],
                                  axis=1).reshape(n2, dblk)
                    o_ref[0, pl.ds(c * chunk, chunk)] = y.astype(o_ref.dtype)
                    return carry
            else:
                ar = ar_ref[:]                        # (C, f2p)
                ai = ai_ref[:]

                def out_body(c, carry):
                    y = (mm(ar, accr[pl.ds(c * f2p, f2p)].astype(
                            jnp.float32))
                         + mm(ai, acci[pl.ds(c * f2p, f2p)].astype(
                            jnp.float32)))
                    o_ref[0, pl.ds(c * chunk, chunk)] = y.astype(o_ref.dtype)
                    return carry

            jax.lax.fori_loop(0, nc, out_body, 0)

    return kernel, f2p


@functools.partial(jax.jit,
                   static_argnames=("chunk", "cols", "fast", "interpret",
                                    "scr_bf16", "staged", "dblk",
                                    "dense_fwd"))
def _fused_causal_call(v, kfr, kfi, *, chunk, cols, fast=False,
                       interpret=False, scr_bf16=None, staged=None,
                       dblk=None, dense_fwd=None):
    import fft_tpu.kernels.pallas_fft as pf
    b, n, d = v.shape
    nc = n // chunk
    ncg = nc * cols
    assert kfr.shape == (b, nc, chunk + 1, ncg), (kfr.shape, b, nc, chunk)
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    plan = _fused_plan(nc, chunk, d, v.dtype.itemsize, fast, cols)
    if plan is None and dblk is None:
        # long-context shapes the v2 resident layout can't hold fall to
        # the grid-banded v3 kernel (same math, ~3x smaller VMEM)
        if _fused_plan_v3(nc, chunk, d, v.dtype.itemsize, fast,
                          cols) is not None:
            return _fused_causal_call_v3(v, kfr, kfi, chunk=chunk,
                                         cols=cols, fast=fast,
                                         interpret=interpret)
    assert plan is not None or (dblk and staged is not None), (nc, chunk, d)
    p_dblk, p_staged, p_scr = plan[:3] if plan else (_DBLK, False, False)
    # explicit kwargs (tests/benchmarks) override the planned variant
    dblk = p_dblk if dblk is None else dblk
    staged = p_staged if staged is None else staged
    scr_bf16 = p_scr if scr_bf16 is None else scr_bf16
    dense_fwd = bool(plan and len(plan) > 3 and plan[3]) \
        if dense_fwd is None else dense_fwd
    if scr_bf16:
        kfr = kfr.astype(jnp.bfloat16)
        kfi = kfi.astype(jnp.bfloat16)
    kernel, f2p = _make_fused_kernel(nc, chunk, cols, precision, dblk,
                                     scr_bf16, staged, dense_fwd)
    sdt = jnp.bfloat16 if scr_bf16 else jnp.float32
    cst = pf._consts(2 * chunk)
    n2 = cst["n2"]
    # The staged DFT's k = c + f1*kq output order IS natural order (row
    # r = kq*f1 + c carries bin c + f1*kq = r) — asserted here so a future
    # plan change can't silently break row alignment.  Kernel row layout is
    # therefore: bins 0..n2-1, the Nyquist bin, zero padding to f2p
    # (K slabs are padded to f2p rows inside the kernel).
    assert np.array_equal(cst["perm"], np.arange(n2)), "non-natural DFT order"

    if staged:
        # (-1)^k delay fold into the inverse untangle rows (delay identity:
        # partial irFFT rows C..2C-1 == full irfft of the sign-flipped
        # spectrum, rows 0..C-1); sign at Nyquist is (+1)^C == +1 (C even).
        sgn = ((-1.0) ** np.arange(n2))[:, None].astype(np.float32)
        inv_rows = {
            "airp": np.asarray(cst["air"], np.float32) * sgn,
            "aiip": np.asarray(cst["aii"], np.float32) * sgn,
            "cirp": np.asarray(cst["cir"], np.float32) * sgn,
            "ciip": np.asarray(cst["cii"], np.float32) * sgn,
        }
    else:
        # partial-irFFT rows, zero columns over the padding
        ar_n, ai_n = _inv_rows_np(chunk)              # (C, n2+1) natural
        ar_p = np.zeros((chunk, f2p), np.float32)
        ai_p = np.zeros((chunk, f2p), np.float32)
        ar_p[:, :n2 + 1] = ar_n
        ai_p[:, :n2 + 1] = ai_n

    # P[c]: one-hot (ncG, cols) picking chunk c's column group out of the
    # producer's lane order l = c*cols + g; stacked along sublanes so the
    # banded loop can pl.ds-slice it per chunk.
    p_sel = np.zeros((nc * ncg, cols), np.float32)
    for c in range(nc):
        for g in range(cols):
            p_sel[c * ncg + c * cols + g, g] = 1.0

    d_per_col = d // cols
    e = np.zeros((d // dblk, cols, dblk), np.float32)
    for j in range(d // dblk):
        for l in range(dblk):
            e[j, (j * dblk + l) // d_per_col, l] = 1.0

    v_pad = jnp.pad(v, ((0, 0), (chunk, 0), (0, 0)))  # segment -1 = zeros

    const_specs = []
    const_args = []

    def add_const(arr):
        arr = np.asarray(arr, np.float32)
        const_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, dl, nd=arr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        const_args.append(jnp.asarray(arr))

    if staged:
        for name in ("i1r", "i1i", "itwr", "itwi", "i2r", "i2i"):
            add_const(cst[name])
        for name in ("airp", "aiip", "cirp", "ciip"):
            add_const(inv_rows[name])
        add_const(cst["dc"])
    else:
        add_const(ar_p)
        add_const(ai_p)
    if dense_fwd:
        mfr_n, mfi_n = _fwd_rows_np(chunk)            # (n2+1, 2C) natural
        mfr_p = np.zeros((f2p, 2 * chunk), np.float32)
        mfi_p = np.zeros((f2p, 2 * chunk), np.float32)
        mfr_p[:n2 + 1] = mfr_n
        mfi_p[:n2 + 1] = mfi_n
        add_const(mfr_p)
        add_const(mfi_p)
    else:
        for name in ("w1r", "w1i", "twr", "twi", "w2r", "w2i",
                     "afr", "afi", "bfr", "bfi"):
            add_const(cst[name])

    grid = (b, d // dblk, nc)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, n, d), v.dtype),
        in_specs=[
            pl.BlockSpec((1, n + chunk, dblk), lambda i, j, dl: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk + 1, ncg),
                         lambda i, j, dl: (i, dl, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk + 1, ncg),
                         lambda i, j, dl: (i, dl, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc * ncg, cols), lambda i, j, dl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, dblk), lambda i, j, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=pl.BlockSpec((1, n, dblk), lambda i, j, dl: (i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
        ],
        interpret=interpret,
        **kwargs,
    )(v_pad, kfr, kfi, jnp.asarray(p_sel), jnp.asarray(e), *const_args)
    return out


# ---------------------------------------------------------------------------
# v3 fused forward — (c, delta) moved from in-kernel loops onto the GRID.
#
# The v2 kernel keeps the whole v window, all K slabs' worth of banded
# accumulators and the full output resident per program, so its VMEM
# footprint scales ~3x with n = nc*chunk and the long-context model shapes
# (nc=16 @ d=1024 — the 350M seq-32k config; nc=32 — 64k) never fit.  Here
# each grid step (b, j, c, delta) touches ONLY:
#   - two 1-chunk v windows (segment c, FFT'd once at delta==0),
#   - one (F2, 128)-lane K block for (delta, chunk-group c),
#   - a single-chunk f32 accumulator (re-zeroed per c),
#   - a single-chunk output window (flushed at delta==c).
# Only the segment-spectra scratch still scales with nc, so seq 32k at
# d=1024 fits with EXACT f32 scratch (~58 MB modeled) and 64k in fast
# mode.  Skipped steps (delta > c) keep every block index unchanged, so
# Mosaic issues no DMAs for them.
# ---------------------------------------------------------------------------


def _v3_kb(nc: int, cols: int):
    """(kb, gpb): K lane-block width and chunk-groups per block."""
    ncg = nc * cols
    if cols % 128 == 0:
        return cols, 1
    if ncg <= 128:
        return ncg, nc
    if ncg % 128 == 0 and 128 % cols == 0:
        return 128, 128 // cols
    return None, None


def _v3_vmem_ok(nc: int, chunk: int, dblk: int, itemsize: int,
                scr_bf16: bool, staged: bool, cols: int) -> bool:
    kb, _ = _v3_kb(nc, cols)
    if kb is None:
        return False
    f2p = _pad8(chunk + 1)
    scr_item = 2 if scr_bf16 else 4
    vwin = 2 * chunk * dblk * itemsize * 2       # two 1-chunk windows, dbuf
    out = chunk * dblk * itemsize * 2
    kblk = f2p * max(kb, 128) * scr_item * 2 * 2
    vscr = 2 * nc * f2p * dblk * scr_item
    acc = 2 * f2p * dblk * 4
    if staged:
        amat = 6 * chunk * 2 * dblk * 4
    else:
        amat = int(chunk * f2p * 4 * 2 * 2 * 1.36)
    total = vwin + out + kblk + vscr + acc + amat + 4 * 1024 * 1024
    return total < 96 * 1024 * 1024


def _fused_plan_v3(nc: int, chunk: int, d: int, itemsize: int = 2,
                   fast: bool = False, cols: int = 32):
    """(dblk, staged, scr_bf16) for the v3 kernel, or None.  Same
    preference order as _fused_plan (f32 > bf16 scratch, dense > staged,
    wide > narrow dblk); used only where the v2 plan comes up empty."""
    from fft_tpu.kernels.pallas_fft import _mix_factors
    if (d % _DBLK or chunk % 8 or not 128 <= chunk <= 2048
            or not 1 <= nc <= 64 or _mix_factors(2 * chunk) is None):
        return None
    scr_opts = (False,) if not fast else (False, True)
    for scr in scr_opts:
        for staged in (False, True):
            for dblk in (512, 256, 128):
                if d % dblk or dblk > d:
                    continue
                if _v3_vmem_ok(nc, chunk, dblk, itemsize, scr, staged,
                               cols):
                    return dblk, staged, scr
    return None


def _make_fused_kernel_v3(nc: int, chunk: int, cols: int, precision,
                          dblk: int, scr_bf16: bool = False,
                          staged: bool = False):
    import fft_tpu.kernels.pallas_fft as pf
    cst = pf._consts(2 * chunk)
    n2, f1, f2d = cst["n2"], cst["f1"], cst["f2"]
    assert n2 == chunk
    f2p = _pad8(n2 + 1)
    kb, gpb = _v3_kb(nc, cols)
    b0r, b0i = cst["b0"].real, cst["b0"].imag
    sdt = jnp.bfloat16 if scr_bf16 else jnp.float32

    def kernel(vlo_ref, vhi_ref, kr_ref, ki_ref, s_ref, e_ref, *rest):
        if staged:
            (i1r_ref, i1i_ref, itwr_ref, itwi_ref, i2r_ref, i2i_ref,
             airp_ref, aiip_ref, cirp_ref, ciip_ref, dc_ref,
             w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
             afr_ref, afi_ref, bfr_ref, bfi_ref,
             o_ref, vr_scr, vi_scr, accr, acci) = rest
        else:
            (ar_ref, ai_ref,
             w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
             afr_ref, afi_ref, bfr_ref, bfi_ref,
             o_ref, vr_scr, vi_scr, accr, acci) = rest
        c = pl.program_id(2)
        delta = pl.program_id(3)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        @pl.when(delta == 0)
        def _():
            # FFT segment c = [prev chunk ; this chunk] into scratch row
            # block c (each segment is transformed exactly once — its
            # first use is (c, delta=0)), and zero this c's accumulator.
            accr[:] = jnp.zeros((f2p, dblk), jnp.float32)
            acci[:] = jnp.zeros((f2p, dblk), jnp.float32)
            seg = jnp.concatenate(
                [vlo_ref[0].astype(jnp.float32),
                 vhi_ref[0].astype(jnp.float32)], axis=0)   # (2C, dblk)
            zs = seg.reshape(n2, 2 * dblk)                  # [z_re | z_im]
            fsr, fsi = pf.staged_dft(zs, None, w1r_ref[:], w1i_ref[:],
                                     twr_ref[:], twi_ref[:], w2r_ref[:],
                                     w2i_ref[:], f1, f2d, precision)
            frr, fir = fsr[:, :dblk], fsr[:, dblk:]
            fri, fii = fsi[:, :dblk], fsi[:, dblk:]
            pr = frr - fii
            pi = fri + fir
            zcr = frr + fii
            zci = fri - fir
            afr, afi = afr_ref[:], afi_ref[:]
            bfr, bfi = bfr_ref[:], bfi_ref[:]
            xr = afr * pr - afi * pi + bfr * zcr - bfi * zci
            xi = afr * pi + afi * pr + bfr * zci + bfi * zcr
            x_nyq = jnp.sum(zs[:, :dblk] - zs[:, dblk:], axis=0,
                            keepdims=True)
            base = c * f2p
            tail = f2p - n2          # = 8: one aligned store covers
            # Nyquist row + zero padding (Mosaic needs %8 row offsets)
            vr_scr[pl.ds(base, n2)] = xr.astype(sdt)
            vi_scr[pl.ds(base, n2)] = xi.astype(sdt)
            vr_scr[pl.ds(base + n2, tail)] = jnp.concatenate(
                [x_nyq, jnp.zeros((tail - 1, dblk), jnp.float32)],
                axis=0).astype(sdt)
            vi_scr[pl.ds(base + n2, tail)] = jnp.zeros((tail, dblk), sdt)

        @pl.when(delta <= c)
        def _():
            # banded term: acc_c += K[delta][:, c-group] (.) Vspec_{c-delta}
            kslab_r = jnp.pad(kr_ref[0, 0], ((0, f2p - n2 - 1), (0, 0)))
            kslab_i = jnp.pad(ki_ref[0, 0], ((0, f2p - n2 - 1), (0, 0)))
            e = e_ref[0]                                    # (cols, dblk)
            if gpb == 1 and kb == cols:
                gr = mm(kslab_r.astype(jnp.float32), e)
                gi = mm(kslab_i.astype(jnp.float32), e)
            else:
                sel = s_ref[pl.ds((c % gpb) * kb, kb)]      # (kb, cols)
                gr = mm(mm(kslab_r.astype(jnp.float32), sel), e)
                gi = mm(mm(kslab_i.astype(jnp.float32), sel), e)
            voff = (c - delta) * f2p
            vr = vr_scr[pl.ds(voff, f2p)].astype(jnp.float32)
            vi = vi_scr[pl.ds(voff, f2p)].astype(jnp.float32)
            accr[:] = accr[:] + (gr * vr - gi * vi)
            acci[:] = acci[:] + (gr * vi + gi * vr)

        @pl.when(delta == c)
        def _():
            # last contribution for chunk c just landed — emit its output
            if staged:
                mr = accr[pl.ds(0, n2)]
                mi = acci[pl.ds(0, n2)] * (1.0 - dc_ref[:])
                m_nyq = accr[pl.ds(n2, 1)]
                airp, aiip = airp_ref[:], aiip_ref[:]
                cirp, ciip = cirp_ref[:], ciip_ref[:]
                amr = airp * mr - aiip * mi
                ami = airp * mi + aiip * mr
                cmr = cirp * mr + ciip * mi                 # C' (.) conj(M)
                cmi = ciip * mr - cirp * mi
                sr = jnp.concatenate([amr, cmr], axis=-1)
                si = jnp.concatenate([ami, -cmi], axis=-1)
                tr, ti = pf.staged_dft(sr, si, i1r_ref[:], i1i_ref[:],
                                       itwr_ref[:], itwi_ref[:],
                                       i2r_ref[:], i2i_ref[:], f1, f2d,
                                       precision)
                z_r = tr[:, :dblk] + tr[:, dblk:] + b0r * m_nyq
                z_i = ti[:, :dblk] - ti[:, dblk:] + b0i * m_nyq
                y = jnp.stack([z_r[:n2 // 2], z_i[:n2 // 2]],
                              axis=1).reshape(n2, dblk)
            else:
                y = mm(ar_ref[:], accr[:]) + mm(ai_ref[:], acci[:])
            o_ref[0] = y.astype(o_ref.dtype)

    return kernel, f2p


@functools.partial(jax.jit,
                   static_argnames=("chunk", "cols", "fast", "interpret",
                                    "scr_bf16", "staged", "dblk"))
def _fused_causal_call_v3(v, kfr, kfi, *, chunk, cols, fast=False,
                          interpret=False, scr_bf16=None, staged=None,
                          dblk=None):
    import fft_tpu.kernels.pallas_fft as pf
    b, n, d = v.shape
    nc = n // chunk
    ncg = nc * cols
    assert kfr.shape == (b, nc, chunk + 1, ncg), (kfr.shape, b, nc, chunk)
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    plan = _fused_plan_v3(nc, chunk, d, v.dtype.itemsize, fast, cols)
    assert plan is not None or (dblk and staged is not None), (nc, chunk, d)
    p_dblk, p_staged, p_scr = plan[:3] if plan else (_DBLK, False, False)
    dblk = p_dblk if dblk is None else dblk
    staged = p_staged if staged is None else staged
    scr_bf16 = p_scr if scr_bf16 is None else scr_bf16
    if scr_bf16:
        kfr = kfr.astype(jnp.bfloat16)
        kfi = kfi.astype(jnp.bfloat16)
    kernel, f2p = _make_fused_kernel_v3(nc, chunk, cols, precision, dblk,
                                        scr_bf16, staged)
    sdt = jnp.bfloat16 if scr_bf16 else jnp.float32
    kb, gpb = _v3_kb(nc, cols)
    assert kb is not None, (nc, cols)
    cst = pf._consts(2 * chunk)
    n2 = cst["n2"]
    assert np.array_equal(cst["perm"], np.arange(n2)), "non-natural DFT order"

    if staged:
        sgn = ((-1.0) ** np.arange(n2))[:, None].astype(np.float32)
        inv_rows = {
            "airp": np.asarray(cst["air"], np.float32) * sgn,
            "aiip": np.asarray(cst["aii"], np.float32) * sgn,
            "cirp": np.asarray(cst["cir"], np.float32) * sgn,
            "ciip": np.asarray(cst["cii"], np.float32) * sgn,
        }
    else:
        ar_n, ai_n = _inv_rows_np(chunk)
        ar_p = np.zeros((chunk, f2p), np.float32)
        ai_p = np.zeros((chunk, f2p), np.float32)
        ar_p[:, :n2 + 1] = ar_n
        ai_p[:, :n2 + 1] = ai_n

    # sel[r*kb + r*cols + g, g] = 1: slicing (c%gpb)*kb rows picks chunk
    # group c out of its 128-lane K block (Mosaic: one-hot matmul, no lane
    # gathers)
    sel = np.zeros((gpb * kb, cols), np.float32)
    for r in range(gpb):
        for g in range(cols):
            sel[r * kb + r * cols + g, g] = 1.0

    d_per_col = d // cols
    e = np.zeros((d // dblk, cols, dblk), np.float32)
    for j in range(d // dblk):
        for l in range(dblk):
            e[j, (j * dblk + l) // d_per_col, l] = 1.0

    v_pad = jnp.pad(v, ((0, 0), (chunk, 0), (0, 0)))  # segment -1 = zeros

    const_specs = []
    const_args = []

    def add_const(arr):
        arr = np.asarray(arr, np.float32)
        const_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, cc, dl, nd=arr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        const_args.append(jnp.asarray(arr))

    if staged:
        for name in ("i1r", "i1i", "itwr", "itwi", "i2r", "i2i"):
            add_const(cst[name])
        for name in ("airp", "aiip", "cirp", "ciip"):
            add_const(inv_rows[name])
        add_const(cst["dc"])
    else:
        add_const(ar_p)
        add_const(ai_p)
    for name in ("w1r", "w1i", "twr", "twi", "w2r", "w2i",
                 "afr", "afi", "bfr", "bfi"):
        add_const(cst[name])

    grid = (b, d // dblk, nc, nc)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, n, d), v.dtype),
        in_specs=[
            # segment c first/second halves of the padded v; index maps
            # ignore delta so skipped steps trigger no refetch
            pl.BlockSpec((1, chunk, dblk), lambda i, j, c, dl: (i, c, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, dblk),
                         lambda i, j, c, dl: (i, c + 1, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk + 1, kb),
                         lambda i, j, c, dl: (i, jnp.minimum(dl, c), 0,
                                              c // gpb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk + 1, kb),
                         lambda i, j, c, dl: (i, jnp.minimum(dl, c), 0,
                                              c // gpb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb * kb, cols), lambda i, j, c, dl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, dblk), lambda i, j, c, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=pl.BlockSpec((1, chunk, dblk),
                               lambda i, j, c, dl: (i, c, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((f2p, dblk), jnp.float32),
            pltpu.VMEM((f2p, dblk), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(v_pad, v_pad, kfr, kfi, jnp.asarray(sel), jnp.asarray(e),
      *const_args)
    return out


def _fused_causal_ref(v, kfr, kfi, chunk, cols,
                      precision=jax.lax.Precision.HIGHEST):
    """jnp reference: segment rFFTs + banded sum + partial irFFT (for the
    VJP and correctness tests).  Matches fused_causal_mix exactly;
    kfr/kfi arrive in the producer layout (B, j, F2, nc_c*cols)."""
    from fft_tpu.kernels.matfft import rfft_matmul
    b, n, d = v.shape
    nc = n // chunk
    f2 = chunk + 1
    vs = v.astype(jnp.float32).reshape(b, nc, chunk, d)
    v_prev = jnp.pad(vs[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    seg = jnp.concatenate([v_prev, vs], axis=2)            # (B, nc, 2C, d)
    vf = rfft_matmul(seg, 2 * chunk, axis=-2, precision=precision)
    # producer layout -> (B, nc_c, nc_j, F2, cols) for the banded ref
    kr = jnp.transpose(kfr.reshape(b, nc, f2, nc, cols), (0, 3, 1, 2, 4))
    ki = jnp.transpose(kfi.reshape(b, nc, f2, nc, cols), (0, 3, 1, 2, 4))
    y = _banded_inverse_ref(jnp.real(vf), jnp.imag(vf), kr, ki, chunk,
                            precision)
    return y.reshape(b, n, d).astype(v.dtype)


@functools.lru_cache(maxsize=None)
def _adj_weights_np(chunk: int) -> np.ndarray:
    """(F2, 1) weights turning irfft_2C into the adjoint of rfft_2C:
    adjoint_rfft(Z) = 2C * irfft(w * Z) with w = [1, 1/2 ... 1/2, 1]
    (cancels irfft's 2x interior-bin doubling; the imaginary parts of the
    DC/Nyquist cotangents multiply sin(pi*f*t/C) == 0 and drop exactly as
    the true adjoint requires)."""
    f2 = chunk + 1
    w = np.full((f2, 1), 0.5, np.float32)
    w[0] = 1.0
    w[-1] = 1.0
    return w


def _fused_causal_bwd(v, kfr, kfi, ybar, chunk, cols, precision):
    """Hand-derived VJP of fused_causal_mix, entirely in the lane-folded
    producer layout: no (c, j, F2) relayout of the nc^2-sized K arrays and
    no autodiff slice-adjoint chains (jax.vjp of the jnp reference measured
    ~5.4x the forward cost at seq 2k; this is written from the adjoint
    algebra of the three linear stages).

    Returns (vbar, kfr_bar, kfi_bar) matching the primal layouts."""
    from fft_tpu.kernels.matfft import irfft_matmul, rfft_matmul
    b, n, d = v.shape
    nc = n // chunk
    f2 = chunk + 1
    d_g = d // cols

    # recompute segment spectra (the primal's delta==0 stage); everything
    # below stays at FULL d lanes — a (cols, d_g) grouped view puts
    # d_g(=16) on the lane axis and runs the whole banded sweep at ~1/8
    # lane utilization (measured 12 ms vs ~4 ms for this formulation)
    vs = v.astype(jnp.float32).reshape(b, nc, chunk, d)
    v_prev = jnp.pad(vs[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    seg = jnp.concatenate([v_prev, vs], axis=2)
    vf = rfft_matmul(seg, 2 * chunk, axis=-2, precision=precision)
    vr, vi = jnp.real(vf), jnp.imag(vf)            # (B, nc, F2, d)

    # accbar planes: R = d acc_re, I = d acc_im  (adjoint of the partial
    # irFFT rows)
    ar, ai = _inv_rows_np(chunk)
    yb = ybar.astype(jnp.float32).reshape(b, nc, chunk, d)
    R = jnp.einsum("tf,bctd->bcfd", jnp.asarray(ar), yb,
                   precision=precision)
    I = jnp.einsum("tf,bctd->bcfd", jnp.asarray(ai), yb,
                   precision=precision)

    kf5r = kfr.reshape(b, nc, f2, nc, cols)        # (B, delta, F2, c, G)
    kf5i = kfi.reshape(b, nc, f2, nc, cols)

    # one-hot group<->channel maps (the same trick the fwd kernel uses:
    # Mosaic/XLA lane repeats and lane reductions ride the MXU)
    e = np.zeros((cols, d), np.float32)
    for l in range(d):
        e[l // d_g, l] = 1.0
    e = jnp.asarray(e)

    krbar = []
    kibar = []
    vrbar = jnp.zeros_like(vr)
    vibar = jnp.zeros_like(vi)
    for dl in range(nc):
        # ---- K grads at lag dl: dK[c, dl] = <accbar_c, V_{c-dl}> -------
        pad = ((0, 0), (dl, 0), (0, 0), (0, 0))
        vr_s = jnp.pad(vr, pad)[:, :nc]            # V_{c-dl} (0 for c<dl)
        vi_s = jnp.pad(vi, pad)[:, :nc]
        # reduce channels->groups via the one-hot, emitting the producer's
        # (B, F2, c, G) order straight out of the contraction
        krbar.append(jnp.einsum("bcfD,gD->bfcg", R * vr_s + I * vi_s, e,
                                precision=precision))
        kibar.append(jnp.einsum("bcfD,gD->bfcg", I * vr_s - R * vi_s, e,
                                precision=precision))
        # ---- V grads: dV_j += conj-combo(K[j+dl, dl], accbar_{j+dl}) ---
        fpad = ((0, 0), (0, dl), (0, 0), (0, 0))
        r_f = jnp.pad(R, fpad)[:, dl:]             # accbar_{j+dl}
        i_f = jnp.pad(I, fpad)[:, dl:]
        k_r = jnp.moveaxis(kf5r[:, dl], 2, 1)      # (B, c, F2, G)
        k_i = jnp.moveaxis(kf5i[:, dl], 2, 1)
        kpad = ((0, 0), (0, dl), (0, 0), (0, 0))
        kr_f = jnp.einsum("bcfg,gD->bcfD",
                          jnp.pad(k_r, kpad)[:, dl:], e,
                          precision=precision)     # expand G -> d lanes
        ki_f = jnp.einsum("bcfg,gD->bcfD",
                          jnp.pad(k_i, kpad)[:, dl:], e,
                          precision=precision)
        vrbar = vrbar + kr_f * r_f + ki_f * i_f
        vibar = vibar + kr_f * i_f - ki_f * r_f

    kfr_bar = jnp.stack(krbar, axis=1).reshape(kfr.shape)
    kfi_bar = jnp.stack(kibar, axis=1).reshape(kfi.shape)

    # adjoint of the segment rFFT, then overlap-add the 2C taps back onto
    # the two chunks each segment covers
    w = jnp.asarray(_adj_weights_np(chunk))
    zbar = jax.lax.complex(vrbar * w, vibar * w)
    segbar = 2 * chunk * irfft_matmul(zbar, 2 * chunk, axis=-2,
                                      precision=precision)
    vbar = segbar[:, :, chunk:] + jnp.pad(
        segbar[:, 1:, :chunk], ((0, 0), (0, 1), (0, 0), (0, 0)))
    return (vbar.reshape(b, n, d).astype(v.dtype),
            kfr_bar.astype(kfr.dtype), kfi_bar.astype(kfi.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_causal_mix(v, kfr, kfi, chunk: int, cols: int,
                     fast: bool = False, interpret: bool = False):
    """y (B, N, d) = segmented causal mix of raw values v against per-chunk
    kernel-segment spectra kfr/kfi in the lane-folded PRODUCER layout
    (B, nc_j, F2, nc_c*cols), F2 = C + 1 — lane l = c*cols + g.

    The whole pipeline (segment rFFTs, banded causal sum, chunk-column
    selection, partial irFFT) runs in one Pallas kernel; v is read from
    HBM exactly once and no host-side K relayout exists."""
    return _fused_causal_call(v, kfr, kfi, chunk=chunk, cols=cols,
                              fast=fast, interpret=interpret)


def _fc_fwd(v, kfr, kfi, chunk, cols, fast, interpret):
    return fused_causal_mix(v, kfr, kfi, chunk, cols, fast, interpret), (
        v, kfr, kfi)


def _fc_bwd(chunk, cols, fast, interpret, res, ybar):
    v, kfr, kfi = res
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    nc = v.shape[1] // chunk
    plan = _bwd_plan(nc, chunk, v.shape[-1], cols, v.dtype.itemsize, fast)
    if plan:
        return _fused_causal_bwd_call(v, kfr, kfi, ybar, chunk=chunk,
                                      cols=cols, fast=fast,
                                      interpret=interpret)
    if _bwd_plan_v3(nc, chunk, v.shape[-1], cols, v.dtype.itemsize, fast):
        # long-context shapes (nc >= 16) past the v2 bwd VMEM model:
        # grid-banded adjoint, sequence windowed over the grid
        return _fused_causal_bwd_call_v3(v, kfr, kfi, ybar, chunk=chunk,
                                         cols=cols, fast=fast,
                                         interpret=interpret)
    return _fused_causal_bwd(v, kfr, kfi, ybar, chunk, cols, prec)


fused_causal_mix.defvjp(_fc_fwd, _fc_bwd)


# ---------------------------------------------------------------------------
# Fused BACKWARD kernel — the adjoint of fused_causal_mix with the same
# structure: the jnp backward is HBM-bound on its (B, nc, F2, d) spectra
# intermediates (~3.3 GB of traffic at seq 2k -> 11 ms); here both FFT
# stages are recomputed in VMEM and every (b, 128-lane) program streams:
#
#   delta == 0   : segment-FFT the v slab into scratch (as in fwd) AND
#                  FFT each ybar chunk zero-padded to 2C with the
#                  partial-irFFT-adjoint row scale folded into the
#                  untangle constants: accbar_c = coef*(-1)^f/2C (.)
#                  rfft_2C([ybar_c ; 0])  (delay identity)
#   every delta  : for c = delta..nc-1:
#                    Kbar[delta] += group-reduce(accbar_c (.)' V_{c-delta})
#                    Vfbar_{c-delta} += sel_c(K[delta]) (.)' accbar_c
#   delta == nc-1: vbar = overlap-add of Madj @ Vfbar_j  (adjoint of the
#                  segment rFFT; descending-j carry handles the 2C overlap)
#
# Kbar is emitted as per-dblk partials (B, d/dblk, nc, F2, ncG) summed by
# XLA afterwards — no cross-grid-step output accumulation needed.
# ---------------------------------------------------------------------------


def _bwd_vmem_ok(nc: int, chunk: int, d: int, cols: int, dblk: int,
                 itemsize: int, staged: bool,
                 scr_bf16: bool = False) -> bool:
    f2p = _pad8(chunk + 1)
    ncg = nc * cols
    n = nc * chunk
    scr_item = 2 if scr_bf16 else 4
    vin = (n + chunk) * dblk * itemsize * 2
    ybin = n * dblk * itemsize * 2
    vout = n * dblk * itemsize * 2
    kblk = f2p * max(ncg, 128) * scr_item * 2 * 2   # K cast to bf16 w/ scr
    kout = f2p * max(ncg, 128) * scr_item * 2 * 2   # K-grad partials too
    scr = 6 * nc * f2p * dblk * scr_item     # vr,vi + R,I + vbr,vbi
    e2 = nc * dblk * max(ncg, 128) * 4
    if staged:
        # staged adjoint irFFT: no dense Madj windows (134 MiB at
        # chunk 2048!), just ~6 live (C, 2*dblk) stage buffers
        madj = 6 * chunk * 2 * dblk * 4
    else:
        madj = 2 * (2 * chunk) * f2p * 4 * 2
    psel = nc * ncg * max(cols, 128) * 4
    total = vin + ybin + vout + kblk + kout + scr + e2 + madj + psel
    return total < 96 * 1024 * 1024


def _bwd_plan(nc: int, chunk: int, d: int, cols: int, itemsize: int = 4,
              fast: bool = False):
    """(dblk, staged, scr_bf16) for the bwd kernel, or None (jnp-adjoint
    fallback).  Dense Madj preferred over the staged adjoint when it fits
    (same VPU-vs-MXU tradeoff as the forward output stage); the fast-mode
    bf16 scratch variant (same policy as the forward plan) exists to FIT
    the long-context training shapes — (8, 2048) at d=1024 is the 350M
    seq-16k config, which otherwise falls to the ~4x-slower jnp adjoint."""
    scr_opts = (False,) if not fast else (False, True)
    for scr in scr_opts:
        for staged in (False, True):
            for dblk in (256, 128):
                if d % dblk:
                    continue
                if _bwd_vmem_ok(nc, chunk, d, cols, dblk, itemsize, staged,
                                scr):
                    return dblk, staged, scr
    return None


# ---------------------------------------------------------------------------
# Kernel-segment spectra producer ("kf kernel"): gate -> K segments in ONE
# VMEM pass.  The jnp pipeline (layers/causal_seg.py: transpose -> length-
# n_fft irfft -> nc rfft_2C's) is the causal block's largest remaining cost
# at seq >= 4k (measured ~5.8 ms of a 7.2 ms block at seq 8k): each matfft
# stage round-trips its (B, n, ncG) complex intermediates through HBM and
# XLA materializes the twiddle/reshape steps.  Here one program per
# (batch, 128-lane block) runs
#
#     K[j] = rfft_2C([ irfft_N(gate)[jC:(j+1)C] ; 0 ])   for all j
#
# entirely in VMEM: the inverse transform is the fused-mix kernel's
# untangle + staged iDFT (pallas_fft._consts(n_fft)), the per-segment
# forward is the fused-causal kernel's pack_fft (staged_dft of the
# lane-stacked [z_re | z_im] slab), and the only HBM traffic is the gate
# block in and the (nc, F2, 128) K planes out.
#
# Lane layout matches the producer convention everywhere: lane l = c*cols+g
# (chunk-major), so the output feeds fused_causal_mix with NO relayout.
# Linear in the gate => custom_vjp against the matfft composition is the
# exact adjoint.
# ---------------------------------------------------------------------------


def kf_spectra_supported(n_fft: int, chunk: int) -> bool:
    """VMEM/plan predicate for the fused kf kernel: both transforms need a
    staged plan, and the inverse stage's ~6 live (n2, 256) f32 buffers +
    the k_time scratch must fit the 116 MB scoped limit (n_fft <= 8192,
    same bound as the staged mix kernel)."""
    import fft_tpu.kernels.pallas_fft as pf
    if pf._mix_factors(n_fft) is None or pf._mix_factors(2 * chunk) is None:
        return False
    if chunk % 8 or 2 * chunk > n_fft or n_fft % chunk:
        return False
    return n_fft <= 8192


def _make_kf_kernel(n_fft: int, chunk: int, nc: int, precision,
                    dense_fwd: bool = False):
    import fft_tpu.kernels.pallas_fft as pf
    ic = pf._consts(n_fft)                 # inverse (length n_fft)
    fc = pf._consts(2 * chunk)             # forward (length 2C)
    n2i, f1i, f2i = ic["n2"], ic["f1"], ic["f2"]
    n2f, f1f, f2f = fc["n2"], fc["f1"], fc["f2"]
    assert n2f == chunk
    b0r, b0i = ic["b0"].real, ic["b0"].imag
    lanes = _DBLK
    f2 = chunk + 1

    def kernel(gr_ref, gi_ref, gn_ref, *rest):
        (i1r_ref, i1i_ref, itwr_ref, itwi_ref, i2r_ref, i2i_ref,
         air_ref, aii_ref, cir_ref, cii_ref, dc_ref) = rest[:11]
        rest = rest[11:]
        if dense_fwd:
            mfr_ref, mfi_ref = rest[:2]
            rest = rest[2:]
        else:
            (w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
             afr_ref, afi_ref, bfr_ref, bfi_ref) = rest[:10]
            rest = rest[10:]
        okr_ref, oki_ref, kt_scr = rest
        # ---- inverse: k_time = irfft_N(gate) into scratch ----------------
        mr = gr_ref[0]                                  # (n2i, 128) stage order
        mi = gi_ref[0] * (1.0 - dc_ref[:])              # drop Im at DC
        air, aii = air_ref[:], aii_ref[:]
        cir, cii = cir_ref[:], cii_ref[:]
        amr = air * mr - aii * mi
        ami = air * mi + aii * mr
        cmr = cir * mr + cii * mi                       # C (.) conj(M)
        cmi = cii * mr - cir * mi
        sr = jnp.concatenate([amr, cmr], axis=-1)       # (n2i, 256)
        si = jnp.concatenate([ami, -cmi], axis=-1)
        tr, ti = pf.staged_dft(sr, si, i1r_ref[:], i1i_ref[:], itwr_ref[:],
                               itwi_ref[:], i2r_ref[:], i2i_ref[:],
                               f1i, f2i, precision)
        m_nyq = gn_ref[0]                               # (1, 128)
        z_r = tr[:, :lanes] + tr[:, lanes:] + b0r * m_nyq
        z_i = ti[:, :lanes] - ti[:, lanes:] + b0i * m_nyq
        kt_scr[:] = jnp.stack([z_r, z_i], axis=1).reshape(n_fft, lanes)

        # ---- forward: K[j] = rfft_2C([k_seg_j ; 0]) ----------------------
        if dense_fwd:
            # zero-padded segment => only the first C input columns of the
            # dense rFFT rows are nonzero: two (F2, C) @ (C, 128) MXU
            # matmuls per segment, no pack/twiddle/untangle VPU passes
            # (same cure as the v2 mix kernel's dense_fwd, 2026-08-19)
            mfr, mfi = mfr_ref[:], mfi_ref[:]

            def seg_body(j, carry):
                seg = kt_scr[pl.ds(j * chunk, chunk)]   # (C, 128)
                okr_ref[0, j] = jax.lax.dot_general(
                    mfr, seg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                oki_ref[0, j] = jax.lax.dot_general(
                    mfi, seg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                return carry
        else:
            w1r, w1i = w1r_ref[:], w1i_ref[:]
            twr, twi = twr_ref[:], twi_ref[:]
            w2r, w2i = w2r_ref[:], w2i_ref[:]
            afr, afi = afr_ref[:], afi_ref[:]
            bfr, bfi = bfr_ref[:], bfi_ref[:]

            def seg_body(j, carry):
                seg = kt_scr[pl.ds(j * chunk, chunk)]   # (C, 128)
                zs = jnp.concatenate(
                    [seg, jnp.zeros((chunk, lanes), jnp.float32)],
                    axis=0).reshape(n2f, 2 * lanes)     # [z_re | z_im] lanes
                fsr, fsi = pf.staged_dft(zs, None, w1r, w1i, twr, twi,
                                         w2r, w2i, f1f, f2f, precision)
                frr, fir = fsr[:, :lanes], fsr[:, lanes:]
                fri, fii = fsi[:, :lanes], fsi[:, lanes:]
                pr = frr - fii
                pi = fri + fir
                zcr = frr + fii
                zci = fri - fir
                xr = afr * pr - afi * pi + bfr * zcr - bfi * zci
                xi = afr * pi + afi * pr + bfr * zci + bfi * zcr
                x_nyq = jnp.sum(zs[:, :lanes] - zs[:, lanes:], axis=0,
                                keepdims=True)
                okr_ref[0, j] = jnp.concatenate([xr, x_nyq], axis=0)
                oki_ref[0, j] = jnp.concatenate(
                    [xi, jnp.zeros((1, lanes), jnp.float32)], axis=0)
                return carry

        jax.lax.fori_loop(0, nc, seg_body, 0, unroll=False)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "chunk", "fast", "interpret"))
def _kf_spectra_call(g_r, g_i, *, n_fft, chunk, fast=False,
                     interpret=False):
    import fft_tpu.kernels.pallas_fft as pf
    b, f_half, L = g_r.shape
    assert f_half == n_fft // 2 + 1, (g_r.shape, n_fft)
    assert L % _DBLK == 0, L
    # k_time has n_fft rows and every chunk of it becomes a segment:
    # requires n == nc*chunk == n_fft (the full-window causal shape).
    nc = n_fft // chunk
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    # dense per-segment forward wherever its (F2, C) row pair stays small
    # (8.4 MB at chunk 1024); the staged form remains for bigger chunks
    dense_fwd = chunk <= 1024
    kernel = _make_kf_kernel(n_fft, chunk, nc, precision, dense_fwd)
    ic = pf._consts(n_fft)
    fc = pf._consts(2 * chunk)
    n2i = ic["n2"]
    assert np.array_equal(ic["perm"], np.arange(n2i)), "non-natural order"
    f2 = chunk + 1

    # stage-order main rows + real Nyquist row (host-side split, tiny)
    gm_r, gm_i = g_r[:, :n2i], g_i[:, :n2i]
    g_nyq = g_r[:, n2i:n2i + 1]

    const_specs = []
    const_args = []
    fwd_names = (("w1r", "w1i", "twr", "twi", "w2r", "w2i",
                  "afr", "afi", "bfr", "bfi") if not dense_fwd else ())
    for cst, names in ((ic, ("i1r", "i1i", "itwr", "itwi", "i2r", "i2i",
                             "air", "aii", "cir", "cii", "dc")),
                       (fc, fwd_names)):
        for name in names:
            arr = np.asarray(cst[name], np.float32)
            const_specs.append(pl.BlockSpec(
                arr.shape, lambda i, j, nd=arr.ndim: (0,) * nd,
                memory_space=pltpu.VMEM))
            const_args.append(jnp.asarray(arr))
    if dense_fwd:
        mfr_n, mfi_n = _fwd_rows_np(chunk)            # (F2, 2C) natural
        mfi_c = mfi_n[:, :chunk].copy()
        mfi_c[-1] = 0.0          # Nyquist sin row is 0 exactly, not ~1e-13
        for arr in (mfr_n[:, :chunk], mfi_c):
            arr = np.ascontiguousarray(arr, np.float32)
            const_specs.append(pl.BlockSpec(
                arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM))
            const_args.append(jnp.asarray(arr))

    grid = (b, L // _DBLK)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT)
    okr, oki = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((b, nc, f2, L), jnp.float32),
            jax.ShapeDtypeStruct((b, nc, f2, L), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, n2i, _DBLK), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n2i, _DBLK), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _DBLK), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=(
            pl.BlockSpec((1, nc, f2, _DBLK), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, f2, _DBLK), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_fft, _DBLK), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(gm_r, gm_i, g_nyq, *const_args)
    return okr, oki


# --- segment-rFFT kernel (kf part B) ---------------------------------------
# For n_fft past the fused kf kernel's VMEM reach (16k/32k), the length-N
# irfft stays matfft (cheap: 0.32 ms at 16k) but the per-segment rfft_2C
# is HBM-bound in matfft (1.51 ms at 16k: the staged complex einsums
# round-trip (B, nc, 2C, L) complex intermediates through HBM several
# times).  This kernel reads each k_time lane-block once and emits all
# segment spectra from VMEM; output segments are blocked (ncb at a time)
# so the out window stays small at nc=16.


# Measured on v5e (benchmarks/ablate_kf_seg.py): the kernel LOSES to the
# matfft rfft_2C pipeline at n_fft 2048 (0.47 vs 0.31 ms — too few
# sequential segments to amortize the per-program constant loads), is a
# wash at 8192, and wins 1.5x/3.0x at 16384/32768 where the matfft
# intermediates round-trip HBM.  Dispatch gates on KF_SEG_MIN_N.
KF_SEG_MIN_N = 8192


def kf_seg_rfft_supported(n_fft: int, chunk: int) -> bool:
    import fft_tpu.kernels.pallas_fft as pf
    if pf._mix_factors(2 * chunk) is None or chunk % 8 or n_fft % chunk:
        return False
    return n_fft <= 32768


def _seg_ncb(nc: int, n: int) -> int:
    """Segments per output block: full nc when the out window is small,
    else the largest divisor keeping it ~16 MiB."""
    for ncb in (nc, 8, 4, 2, 1):
        if nc % ncb:
            continue
        out = 2 * ncb * (n // nc + 1) * _DBLK * 4 * 2
        if out <= 18 * 1024 * 1024:
            return ncb
    return 1


def _make_seg_rfft_kernel(chunk: int, ncb: int, precision):
    import fft_tpu.kernels.pallas_fft as pf
    fc = pf._consts(2 * chunk)
    n2f, f1f, f2f = fc["n2"], fc["f1"], fc["f2"]
    assert n2f == chunk
    lanes = _DBLK

    def kernel(kt_ref, w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref,
               w2i_ref, afr_ref, afi_ref, bfr_ref, bfi_ref,
               okr_ref, oki_ref):
        cb = pl.program_id(2)
        w1r, w1i = w1r_ref[:], w1i_ref[:]
        twr, twi = twr_ref[:], twi_ref[:]
        w2r, w2i = w2r_ref[:], w2i_ref[:]
        afr, afi = afr_ref[:], afi_ref[:]
        bfr, bfi = bfr_ref[:], bfi_ref[:]

        def seg_body(j, carry):
            seg = kt_ref[0, pl.ds((cb * ncb + j) * chunk, chunk)].astype(
                jnp.float32)
            zs = jnp.concatenate(
                [seg, jnp.zeros((chunk, lanes), jnp.float32)],
                axis=0).reshape(n2f, 2 * lanes)
            fsr, fsi = pf.staged_dft(zs, None, w1r, w1i, twr, twi,
                                     w2r, w2i, f1f, f2f, precision)
            frr, fir = fsr[:, :lanes], fsr[:, lanes:]
            fri, fii = fsi[:, :lanes], fsi[:, lanes:]
            pr = frr - fii
            pi = fri + fir
            zcr = frr + fii
            zci = fri - fir
            xr = afr * pr - afi * pi + bfr * zcr - bfi * zci
            xi = afr * pi + afi * pr + bfr * zci + bfi * zcr
            x_nyq = jnp.sum(zs[:, :lanes] - zs[:, lanes:], axis=0,
                            keepdims=True)
            okr_ref[0, pl.ds(j, 1)] = jnp.concatenate(
                [xr, x_nyq], axis=0)[None]
            oki_ref[0, pl.ds(j, 1)] = jnp.concatenate(
                [xi, jnp.zeros((1, lanes), jnp.float32)], axis=0)[None]
            return carry

        jax.lax.fori_loop(0, ncb, seg_body, 0, unroll=False)

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "fast", "interpret"))
def _kf_seg_rfft_call(kt, *, chunk, fast=False, interpret=False):
    import fft_tpu.kernels.pallas_fft as pf
    b, n, L = kt.shape
    nc = n // chunk
    assert nc * chunk == n and L % _DBLK == 0, (kt.shape, chunk)
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    ncb = _seg_ncb(nc, n)
    kernel = _make_seg_rfft_kernel(chunk, ncb, precision)
    fc = pf._consts(2 * chunk)
    f2 = chunk + 1

    const_specs = []
    const_args = []
    for name in ("w1r", "w1i", "twr", "twi", "w2r", "w2i",
                 "afr", "afi", "bfr", "bfi"):
        arr = np.asarray(fc[name], np.float32)
        const_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, c, nd=arr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        const_args.append(jnp.asarray(arr))

    grid = (b, L // _DBLK, nc // ncb)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT)
    okr, oki = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((b, nc, f2, L), jnp.float32),
            jax.ShapeDtypeStruct((b, nc, f2, L), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, n, _DBLK), lambda i, j, c: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=(
            pl.BlockSpec((1, ncb, f2, _DBLK), lambda i, j, c: (i, c, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ncb, f2, _DBLK), lambda i, j, c: (i, c, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        **kwargs,
    )(kt, *const_args)
    return okr, oki


def _kf_seg_rfft_ref(kt, chunk, precision=jax.lax.Precision.HIGHEST):
    from fft_tpu.kernels.matfft import rfft_matmul
    b, n, L = kt.shape
    nc = n // chunk
    k_seg = kt.reshape(b, nc, chunk, L)
    kf = rfft_matmul(k_seg, 2 * chunk, axis=-2, precision=precision)
    return jnp.real(kf), jnp.imag(kf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def kf_seg_rfft(kt, chunk: int, fast: bool = False,
                interpret: bool = False):
    """(kfr, kfi) (B, nc, F2, L) = rfft_2C of each zero-padded chunk of
    ``kt (B, nc*chunk, L)`` — the kf pipeline's part B as one kernel."""
    return _kf_seg_rfft_call(kt, chunk=chunk, fast=fast,
                             interpret=interpret)


def _ksr_fwd(kt, chunk, fast, interpret):
    return kf_seg_rfft(kt, chunk, fast, interpret), kt


def _ksr_bwd(chunk, fast, interpret, kt, kbar):
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    _, vjp = jax.vjp(lambda k: _kf_seg_rfft_ref(k, chunk, prec), kt)
    return vjp(kbar)


kf_seg_rfft.defvjp(_ksr_fwd, _ksr_bwd)


def _kf_spectra_ref(g_r, g_i, n_fft, chunk,
                    precision=jax.lax.Precision.HIGHEST):
    """matfft composition of the same map (VJP + correctness tests)."""
    from fft_tpu.kernels.matfft import irfft_matmul, rfft_matmul
    b, f_half, L = g_r.shape
    nc = n_fft // chunk
    g = jax.lax.complex(g_r, g_i)
    k_time = irfft_matmul(g, n_fft, axis=-2, precision=precision)
    k_seg = k_time.reshape(b, nc, chunk, L)
    kf = rfft_matmul(k_seg, 2 * chunk, axis=-2, precision=precision)
    return jnp.real(kf), jnp.imag(kf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def kf_spectra(g_r, g_i, n_fft: int, chunk: int, fast: bool = False,
               interpret: bool = False):
    """(kfr, kfi) (B, nc, F2, L) = per-segment 2C-spectra of the length-
    n_fft gate kernels, lanes in the producer layout l = c*cols + g.

    g_r/g_i: (B, n_fft//2+1, L) natural-order gate spectrum planes.
    Requires n_fft == nc*chunk (full-window causal training shapes)."""
    return _kf_spectra_call(g_r, g_i, n_fft=n_fft, chunk=chunk, fast=fast,
                            interpret=interpret)


def _kf_fwd(g_r, g_i, n_fft, chunk, fast, interpret):
    return kf_spectra(g_r, g_i, n_fft, chunk, fast, interpret), (g_r, g_i)


def _kf_bwd(n_fft, chunk, fast, interpret, res, kbar):
    g_r, g_i = res
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    _, vjp = jax.vjp(
        lambda a, b: _kf_spectra_ref(a, b, n_fft, chunk, prec), g_r, g_i)
    return vjp(kbar)


kf_spectra.defvjp(_kf_fwd, _kf_bwd)


def _make_fused_bwd_kernel(nc: int, chunk: int, cols: int, precision,
                           dblk: int, staged: bool = False,
                           scr_bf16: bool = False):
    import fft_tpu.kernels.pallas_fft as pf
    cst = pf._consts(2 * chunk)
    n2, f1, f2d = cst["n2"], cst["f1"], cst["f2"]
    assert n2 == chunk
    f2p = _pad8(n2 + 1)
    ncg = nc * cols
    sdt = jnp.bfloat16 if scr_bf16 else jnp.float32

    b0r, b0i = cst["b0"].real, cst["b0"].imag

    def kernel(v_ref, yb_ref, kr_ref, ki_ref, p_ref, e_ref, e2_ref,
               *rest):
        if staged:
            (i1r_ref, i1i_ref, itwr_ref, itwi_ref, i2r_ref, i2i_ref,
             airw_ref, aiiw_ref, cirw_ref, ciiw_ref, dc_ref,
             w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
             afr_ref, afi_ref, bfr_ref, bfi_ref,
             sfr_ref, sfi_ref, sgr_ref, sgi_ref, snyq_ref,
             ov_ref, okr_ref, oki_ref,
             vr_scr, vi_scr, rbar, ibar, vbr, vbi) = rest
        else:
            (mar_ref, mai_ref,
             w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
             afr_ref, afi_ref, bfr_ref, bfi_ref,
             sfr_ref, sfi_ref, sgr_ref, sgi_ref, snyq_ref,
             ov_ref, okr_ref, oki_ref,
             vr_scr, vi_scr, rbar, ibar, vbr, vbi) = rest
        delta = pl.program_id(2)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        @pl.when(delta == 0)
        def _():
            zero1 = jnp.zeros((nc * f2p, dblk), sdt)
            vr_scr[:] = zero1   # pad rows must be 0, not garbage (0*nan)
            vi_scr[:] = zero1
            vbr[:] = zero1
            vbi[:] = zero1
            rbar[:] = zero1
            ibar[:] = zero1
            w1r, w1i = w1r_ref[:], w1i_ref[:]
            twr, twi = twr_ref[:], twi_ref[:]
            w2r, w2i = w2r_ref[:], w2i_ref[:]

            def pack_fft(slab):
                """(2C, dblk) real slab -> untangled rFFT rows; returns
                (xr, xi (n2, dblk), sums for the Nyquist row)."""
                zs = slab.reshape(n2, 2 * dblk)
                fsr, fsi = pf.staged_dft(zs, None, w1r, w1i, twr, twi,
                                         w2r, w2i, f1, f2d, precision)
                frr, fir = fsr[:, :dblk], fsr[:, dblk:]
                fri, fii = fsi[:, :dblk], fsi[:, dblk:]
                return ((frr - fii), (fri + fir), (frr + fii), (fri - fir),
                        jnp.sum(zs[:, :dblk] - zs[:, dblk:], axis=0,
                                keepdims=True))

            afr, afi = afr_ref[:], afi_ref[:]
            bfr, bfi = bfr_ref[:], bfi_ref[:]

            def seg_body(s, carry):
                seg = v_ref[0, pl.ds(s * chunk, 2 * chunk)].astype(
                    jnp.float32)
                pr, pi, zcr, zci, x_nyq = pack_fft(seg)
                xr = afr * pr - afi * pi + bfr * zcr - bfi * zci
                xi = afr * pi + afi * pr + bfr * zci + bfi * zcr
                base = s * f2p
                vr_scr[pl.ds(base, n2)] = xr.astype(sdt)
                vi_scr[pl.ds(base, n2)] = xi.astype(sdt)
                vr_scr[pl.ds(base + n2, 1)] = x_nyq.astype(sdt)
                return carry

            jax.lax.fori_loop(0, nc, seg_body, 0)

            # accbar: scaled rFFT of [ybar_c ; 0] — sfr/sfi/sgr/sgi are the
            # untangle constants with the adjoint row scale pre-folded
            sfr, sfi = sfr_ref[:], sfi_ref[:]
            sgr, sgi = sgr_ref[:], sgi_ref[:]
            s_nyq = snyq_ref[0, 0]

            def acc_body(c, carry):
                yc = yb_ref[0, pl.ds(c * chunk, chunk)].astype(jnp.float32)
                slab = jnp.concatenate(
                    [yc, jnp.zeros((chunk, dblk), jnp.float32)], axis=0)
                pr, pi, zcr, zci, x_nyq = pack_fft(slab)
                rr = sfr * pr - sfi * pi + sgr * zcr - sgi * zci
                ri = sfr * pi + sfi * pr + sgr * zci + sgi * zcr
                base = c * f2p
                rbar[pl.ds(base, n2)] = rr.astype(sdt)
                ibar[pl.ds(base, n2)] = ri.astype(sdt)
                rbar[pl.ds(base + n2, 1)] = (x_nyq * s_nyq).astype(sdt)
                ibar[pl.ds(base + n2, 1)] = jnp.zeros((1, dblk), sdt)
                return carry

            jax.lax.fori_loop(0, nc, acc_body, 0)

        e = e_ref[0]                                   # (cols, dblk)
        kslab_r = jnp.pad(kr_ref[0, 0], ((0, f2p - n2 - 1), (0, 0)))
        kslab_i = jnp.pad(ki_ref[0, 0], ((0, f2p - n2 - 1), (0, 0)))

        def delta_body(c, carry):
            kbr, kbi = carry
            roff = c * f2p
            rr = rbar[pl.ds(roff, f2p)].astype(jnp.float32)
            ri = ibar[pl.ds(roff, f2p)].astype(jnp.float32)
            voff = (c - delta) * f2p
            vr = vr_scr[pl.ds(voff, f2p)].astype(jnp.float32)
            vi = vi_scr[pl.ds(voff, f2p)].astype(jnp.float32)
            # K grads: group-reduce to this chunk's column block
            e2c = e2_ref[0, pl.ds(c, 1)][0]            # (dblk, ncG)
            kbr = kbr + mm(rr * vr + ri * vi, e2c)
            kbi = kbi + mm(ri * vr - rr * vi, e2c)
            # V grads at j = c - delta
            pc = p_ref[pl.ds(c * ncg, ncg)]
            gr = mm(mm(kslab_r, pc), e)
            gi = mm(mm(kslab_i, pc), e)
            joff = (c - delta) * f2p
            vbr[pl.ds(joff, f2p)] = (
                vbr[pl.ds(joff, f2p)].astype(jnp.float32)
                + (gr * rr + gi * ri)).astype(sdt)
            vbi[pl.ds(joff, f2p)] = (
                vbi[pl.ds(joff, f2p)].astype(jnp.float32)
                + (gr * ri - gi * rr)).astype(sdt)
            return kbr, kbi

        zero_kb = jnp.zeros((f2p, ncg), jnp.float32)
        kbr, kbi = jax.lax.fori_loop(delta, nc, delta_body,
                                     (zero_kb, zero_kb))
        # accumulation stays f32 in-register; only the per-(dblk, delta)
        # PARTIAL is rounded to the scratch dtype — XLA sums the d/dblk
        # partials in f32 afterwards (fast-mode error ~1e-3, in budget)
        okr_ref[0, 0, 0] = kbr[:n2 + 1].astype(okr_ref.dtype)
        oki_ref[0, 0, 0] = kbi[:n2 + 1].astype(oki_ref.dtype)

        @pl.when(delta == nc - 1)
        def _():
            if staged:
                # staged adjoint of the segment rFFT:
                # adjoint_rfft(Z) = 2C * irfft_2C(w (.) Z); the 2C*w
                # per-bin weights are folded into the A/C untangle rows
                # host-side, so each segment costs one staged inverse
                # (full 2C rows — both halves feed the overlap-add).
                i1r, i1i = i1r_ref[:], i1i_ref[:]
                itwr, itwi = itwr_ref[:], itwi_ref[:]
                i2r, i2i = i2r_ref[:], i2i_ref[:]
                airw, aiiw = airw_ref[:], aiiw_ref[:]
                cirw, ciiw = cirw_ref[:], ciiw_ref[:]
                dc = dc_ref[:]
                b0rw = b0r * 2 * chunk
                b0iw = b0i * 2 * chunk

                def j_body(i, carry):
                    j = nc - 1 - i
                    base = j * f2p
                    mr = vbr[pl.ds(base, n2)].astype(jnp.float32)
                    mi_ = vbi[pl.ds(base, n2)].astype(jnp.float32) * (
                        1.0 - dc)
                    m_nyq = vbr[pl.ds(base + n2, 1)].astype(jnp.float32)
                    amr = airw * mr - aiiw * mi_
                    ami = airw * mi_ + aiiw * mr
                    cmr = cirw * mr + ciiw * mi_       # C' (.) conj(M)
                    cmi = ciiw * mr - cirw * mi_
                    sr = jnp.concatenate([amr, cmr], axis=-1)
                    si = jnp.concatenate([ami, -cmi], axis=-1)
                    tr, ti = pf.staged_dft(sr, si, i1r, i1i, itwr, itwi,
                                           i2r, i2i, f1, f2d, precision)
                    z_r = tr[:, :dblk] + tr[:, dblk:] + b0rw * m_nyq
                    z_i = ti[:, :dblk] - ti[:, dblk:] + b0iw * m_nyq
                    sb = jnp.stack([z_r, z_i], axis=1).reshape(
                        2 * chunk, dblk)
                    ov_ref[0, pl.ds(j * chunk, chunk)] = (
                        sb[chunk:] + carry).astype(ov_ref.dtype)
                    return sb[:chunk]
            else:
                mar = mar_ref[:]                       # (2C, f2p)
                mai = mai_ref[:]

                def j_body(i, carry):
                    j = nc - 1 - i
                    sb = (mm(mar, vbr[pl.ds(j * f2p, f2p)].astype(
                              jnp.float32))
                          + mm(mai, vbi[pl.ds(j * f2p, f2p)].astype(
                              jnp.float32)))                    # (2C, dblk)
                    ov_ref[0, pl.ds(j * chunk, chunk)] = (
                        sb[chunk:] + carry).astype(ov_ref.dtype)
                    return sb[:chunk]

            jax.lax.fori_loop(0, nc, j_body,
                              jnp.zeros((chunk, dblk), jnp.float32))

    return kernel, f2p


@functools.partial(jax.jit,
                   static_argnames=("chunk", "cols", "fast", "interpret",
                                    "staged", "dblk", "scr_bf16"))
def _fused_causal_bwd_call(v, kfr, kfi, ybar, *, chunk, cols, fast=False,
                           interpret=False, staged=None, dblk=None,
                           scr_bf16=None):
    import fft_tpu.kernels.pallas_fft as pf
    b, n, d = v.shape
    nc = n // chunk
    ncg = nc * cols
    f2 = chunk + 1
    d_g = d // cols
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    plan = _bwd_plan(nc, chunk, d, cols, v.dtype.itemsize, fast)
    assert plan is not None or (dblk and staged is not None), (nc, chunk, d)
    p_dblk, p_staged, p_scr = plan[:3] if plan else (_DBLK, False, False)
    dblk = p_dblk if dblk is None else dblk
    staged = p_staged if staged is None else staged
    scr_bf16 = p_scr if scr_bf16 is None else scr_bf16
    # cotangents must keep the PRIMAL K dtype (f32) even when the kernel
    # consumes a bf16 copy — jax.vjp rejects dtype-mismatched cotangents
    k_dtype = kfr.dtype
    if scr_bf16:
        kfr = kfr.astype(jnp.bfloat16)
        kfi = kfi.astype(jnp.bfloat16)
    sdt = jnp.bfloat16 if scr_bf16 else jnp.float32
    kernel, f2p = _make_fused_bwd_kernel(nc, chunk, cols, precision, dblk,
                                         staged, scr_bf16)
    cst = pf._consts(2 * chunk)
    n2 = cst["n2"]
    assert np.array_equal(cst["perm"], np.arange(n2)), "non-natural DFT order"

    # adjoint row scale s_f = coef_f * (-1)^f / 2C folded into a second set
    # of untangle constants (the delay identity: rows C..2C-1 of the
    # partial-irFFT adjoint == s (.) rfft_2C([y ; 0]))
    f_idx = np.arange(n2)
    coef = np.full(n2, 2.0, np.float32)
    coef[0] = 1.0
    s_rows = (coef * ((-1.0) ** f_idx) / (2 * chunk)).astype(np.float32)
    s_col = s_rows[:, None]
    s_nyq = np.float32(((-1.0) ** n2) / (2 * chunk))   # coef_nyq = 1

    if staged:
        # adjoint_rfft(Z) = 2C * irfft_2C(w (.) Z); fold (2C * w) into the
        # inverse untangle rows (w = [1, 1/2..1/2] over bins 0..C-1;
        # Nyquist w=1 rides the b0 term scaled in-kernel)
        w2c = np.full((n2, 1), float(chunk), np.float32)   # 2C * 1/2
        w2c[0] = 2.0 * chunk                               # 2C * 1
        adj_rows = {
            "airw": np.asarray(cst["air"], np.float32) * w2c,
            "aiiw": np.asarray(cst["aii"], np.float32) * w2c,
            "cirw": np.asarray(cst["cir"], np.float32) * w2c,
            "ciiw": np.asarray(cst["cii"], np.float32) * w2c,
        }
    else:
        # Madj: adjoint of the 2C rFFT (no normalization, no coef doubling)
        t_idx = np.arange(2 * chunk)
        ang = 2.0 * np.pi * np.outer(t_idx, np.arange(f2)) / (2 * chunk)
        mar = np.zeros((2 * chunk, f2p), np.float32)
        mai = np.zeros((2 * chunk, f2p), np.float32)
        mar[:, :f2] = np.cos(ang)
        mai[:, :f2] = -np.sin(ang)

    p_sel = np.zeros((nc * ncg, cols), np.float32)
    for c in range(nc):
        for g in range(cols):
            p_sel[c * ncg + c * cols + g, g] = 1.0

    njb = d // dblk
    e = np.zeros((njb, cols, dblk), np.float32)
    e2 = np.zeros((njb, nc, dblk, ncg), np.float32)
    for j in range(njb):
        for l in range(dblk):
            g = (j * dblk + l) // d_g
            e[j, g, l] = 1.0
            for c in range(nc):
                e2[j, c, l, c * cols + g] = 1.0

    sfr = s_col * np.asarray(cst["afr"], np.float32)
    sfi = s_col * np.asarray(cst["afi"], np.float32)
    sgr = s_col * np.asarray(cst["bfr"], np.float32)
    sgi = s_col * np.asarray(cst["bfi"], np.float32)
    snyq = np.full((1, 1), s_nyq, np.float32)

    v_pad = jnp.pad(v, ((0, 0), (chunk, 0), (0, 0)))

    const_specs = []
    const_args = []

    def add_const(arr):
        arr = np.asarray(arr, np.float32)
        const_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, dl, nd=arr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        const_args.append(jnp.asarray(arr))

    if staged:
        for name in ("i1r", "i1i", "itwr", "itwi", "i2r", "i2i"):
            add_const(cst[name])
        for name in ("airw", "aiiw", "cirw", "ciiw"):
            add_const(adj_rows[name])
        add_const(cst["dc"])
    else:
        add_const(mar)
        add_const(mai)
    for name in ("w1r", "w1i", "twr", "twi", "w2r", "w2i",
                 "afr", "afi", "bfr", "bfi"):
        add_const(cst[name])
    for arr in (sfr, sfi, sgr, sgi, snyq):
        add_const(arr)

    grid = (b, njb, nc)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT)
    ov, okr, oki = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), v.dtype),
            jax.ShapeDtypeStruct((b, njb, nc, f2, ncg), sdt),
            jax.ShapeDtypeStruct((b, njb, nc, f2, ncg), sdt),
        ),
        in_specs=[
            pl.BlockSpec((1, n + chunk, dblk), lambda i, j, dl: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dblk), lambda i, j, dl: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f2, ncg), lambda i, j, dl: (i, dl, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f2, ncg), lambda i, j, dl: (i, dl, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc * ncg, cols), lambda i, j, dl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, dblk), lambda i, j, dl: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, dblk, ncg), lambda i, j, dl: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=(
            pl.BlockSpec((1, n, dblk), lambda i, j, dl: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, f2, ncg),
                         lambda i, j, dl: (i, j, dl, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, f2, ncg),
                         lambda i, j, dl: (i, j, dl, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
        ],
        interpret=interpret,
        **kwargs,
    )(v_pad, ybar.astype(v.dtype), kfr, kfi, jnp.asarray(p_sel),
      jnp.asarray(e), jnp.asarray(e2), *const_args)
    kfr_bar = jnp.sum(okr.astype(jnp.float32), axis=1).astype(k_dtype)
    kfi_bar = jnp.sum(oki.astype(jnp.float32), axis=1).astype(k_dtype)
    return ov, kfr_bar, kfi_bar


# ---------------------------------------------------------------------------
# v3-style grid-banded BACKWARD kernel: the long-context training shapes
# (nc >= 16: SPECTRE-350M at seq 32k, chunk 2048) overflow the v2 bwd
# kernel's VMEM model (six full-sequence (nc*f2p, dblk) scratches plus the
# whole v/ybar/vbar slabs resident at once) and fell to the ~4x-slower jnp
# adjoint.  Here the sequence rides the grid like the v3 forward:
#
#   grid = (b, d/dblk, j, delta), j = source segment, delta innermost
#
#   (j==0, delta==0): cache accbar_c for ALL c in an (nc*f2p, dblk)
#       scratch — one scaled rFFT of [ybar_c ; 0] per chunk (the partial-
#       irFFT-adjoint row scale folded into the untangle constants).
#   delta == 0     : segment-rFFT the j'th v window into a single-segment
#       (f2p, dblk) scratch; zero the Vfbar accumulator.
#   c = j + delta < nc:
#       Vfbar_j   += conj-combo(K[delta] columns of chunk c, accbar_c)
#       Kbar[delta][:, c cols] = dblk-reduce(accbar_c (.)' Vspec_j)
#       (each (delta, c) pair has exactly one source j = c - delta, so
#       every Kbar block is written exactly once — steps with c >= nc
#       land on a trash row that is sliced off outside)
#   delta == nc-1  : staged adjoint of the segment rFFT (2C*w folded into
#       the inverse untangle rows) -> (2C, dblk) taps, emitted per
#       segment; the overlap-add onto the two chunks each segment covers
#       happens outside (no descending-j carry ordering needed).
#
# Unlike a naive split, BOTH cotangents come out of one pass over one
# set of cached spectra: no nc^2 FFT recompute, v and ybar each read
# from HBM once per (b, dblk) program.  Reference adjoint semantics:
# jax.vjp of layers/causal_seg.py's overlap-save composition
# (/root/reference/spectre.py:506-551 is the dense-gather equivalent).
# ---------------------------------------------------------------------------


def _bwd_vmem_ok_v3(nc: int, chunk: int, dblk: int, itemsize: int,
                    scr_bf16: bool, cols: int) -> bool:
    kb, _ = _v3_kb(nc, cols)
    if kb is None:
        return False
    f2p = _pad8(chunk + 1)
    scr_item = 2 if scr_bf16 else 4
    n = nc * chunk
    ybin = n * dblk * itemsize * 2
    vwin = 2 * chunk * dblk * itemsize * 2
    kblk = f2p * max(kb, 128) * scr_item * 2 * 2
    rbar = 2 * nc * f2p * dblk * scr_item
    vspec = 2 * f2p * dblk * 4
    acc = 2 * f2p * dblk * 4
    ovout = 2 * chunk * dblk * itemsize * 2
    okout = f2p * max(2 * cols, 128) * scr_item * 2
    amat = 6 * chunk * 2 * dblk * 4          # staged inverse stage buffers
    total = (ybin + vwin + kblk + rbar + vspec + acc + ovout + okout
             + amat + 6 * 1024 * 1024)
    return total < 96 * 1024 * 1024


def _bwd_plan_v3(nc: int, chunk: int, d: int, cols: int, itemsize: int = 4,
                 fast: bool = False):
    """(dblk, scr_bf16) for the v3 bwd kernel, or None.  Only consulted
    where the v2 bwd plan is empty; always staged (its target shapes have
    chunk 2048 where the dense Madj alone is 134 MiB)."""
    from fft_tpu.kernels.pallas_fft import _mix_factors
    if (d % _DBLK or chunk % 8 or not 128 <= chunk <= 2048
            or not 1 <= nc <= 64 or _mix_factors(2 * chunk) is None):
        return None
    scr_opts = (False,) if not fast else (False, True)
    for scr in scr_opts:
        for dblk in (256, 128):
            if d % dblk or dblk > d:
                continue
            if _bwd_vmem_ok_v3(nc, chunk, dblk, itemsize, scr, cols):
                return dblk, scr
    return None


def _make_fused_bwd_kernel_v3(nc: int, chunk: int, cols: int, precision,
                              dblk: int, scr_bf16: bool = False):
    import fft_tpu.kernels.pallas_fft as pf
    cst = pf._consts(2 * chunk)
    n2, f1, f2d = cst["n2"], cst["f1"], cst["f2"]
    assert n2 == chunk
    f2p = _pad8(n2 + 1)
    kb, gpb = _v3_kb(nc, cols)
    sdt = jnp.bfloat16 if scr_bf16 else jnp.float32
    b0r, b0i = cst["b0"].real, cst["b0"].imag
    tail = f2p - n2          # 8-row aligned Nyquist+pad store (Mosaic)

    def kernel(yb_ref, vlo_ref, vhi_ref, kr_ref, ki_ref, s_ref, e_ref,
               ek_ref,
               i1r_ref, i1i_ref, itwr_ref, itwi_ref, i2r_ref, i2i_ref,
               airw_ref, aiiw_ref, cirw_ref, ciiw_ref, dc_ref,
               w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
               afr_ref, afi_ref, bfr_ref, bfi_ref,
               sfr_ref, sfi_ref, sgr_ref, sgi_ref, snyq_ref,
               ov_ref, ok_ref,
               rbar, ibar, vr_s, vi_s, accr, acci):
        j = pl.program_id(2)
        dl = pl.program_id(3)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        def pack_fft(slab):
            zs = slab.reshape(n2, 2 * dblk)
            fsr, fsi = pf.staged_dft(zs, None, w1r_ref[:], w1i_ref[:],
                                     twr_ref[:], twi_ref[:], w2r_ref[:],
                                     w2i_ref[:], f1, f2d, precision)
            frr, fir = fsr[:, :dblk], fsr[:, dblk:]
            fri, fii = fsi[:, :dblk], fsi[:, dblk:]
            return ((frr - fii), (fri + fir), (frr + fii), (fri - fir),
                    jnp.sum(zs[:, :dblk] - zs[:, dblk:], axis=0,
                            keepdims=True))

        @pl.when(jnp.logical_and(j == 0, dl == 0))
        def _():
            # accbar cache for every chunk c (reused across all j)
            sfr, sfi = sfr_ref[:], sfi_ref[:]
            sgr, sgi = sgr_ref[:], sgi_ref[:]
            s_nyq = snyq_ref[0, 0]

            def acc_body(c, carry):
                yc = yb_ref[0, pl.ds(c * chunk, chunk)].astype(jnp.float32)
                slab = jnp.concatenate(
                    [yc, jnp.zeros((chunk, dblk), jnp.float32)], axis=0)
                pr, pi, zcr, zci, x_nyq = pack_fft(slab)
                rr = sfr * pr - sfi * pi + sgr * zcr - sgi * zci
                ri = sfr * pi + sfi * pr + sgr * zci + sgi * zcr
                base = c * f2p
                rbar[pl.ds(base, n2)] = rr.astype(sdt)
                ibar[pl.ds(base, n2)] = ri.astype(sdt)
                rbar[pl.ds(base + n2, tail)] = jnp.concatenate(
                    [x_nyq * s_nyq,
                     jnp.zeros((tail - 1, dblk), jnp.float32)],
                    axis=0).astype(sdt)
                ibar[pl.ds(base + n2, tail)] = jnp.zeros((tail, dblk), sdt)
                return carry

            jax.lax.fori_loop(0, nc, acc_body, 0)

        @pl.when(dl == 0)
        def _():
            # this j's segment spectrum + fresh Vfbar accumulator
            accr[:] = jnp.zeros((f2p, dblk), jnp.float32)
            acci[:] = jnp.zeros((f2p, dblk), jnp.float32)
            seg = jnp.concatenate(
                [vlo_ref[0].astype(jnp.float32),
                 vhi_ref[0].astype(jnp.float32)], axis=0)
            pr, pi, zcr, zci, x_nyq = pack_fft(seg)
            afr, afi = afr_ref[:], afi_ref[:]
            bfr, bfi = bfr_ref[:], bfi_ref[:]
            vr_s[pl.ds(0, n2)] = afr * pr - afi * pi + bfr * zcr - bfi * zci
            vi_s[pl.ds(0, n2)] = afr * pi + afi * pr + bfr * zci + bfi * zcr
            vr_s[pl.ds(n2, tail)] = jnp.concatenate(
                [x_nyq, jnp.zeros((tail - 1, dblk), jnp.float32)], axis=0)
            vi_s[pl.ds(n2, tail)] = jnp.zeros((tail, dblk), jnp.float32)

        c = j + dl

        @pl.when(c <= nc - 1)
        def _():
            kslab_r = jnp.pad(kr_ref[0, 0].astype(jnp.float32),
                              ((0, f2p - n2 - 1), (0, 0)))
            kslab_i = jnp.pad(ki_ref[0, 0].astype(jnp.float32),
                              ((0, f2p - n2 - 1), (0, 0)))
            e = e_ref[0]                              # (cols, dblk)
            if gpb == 1 and kb == cols:
                gr = mm(kslab_r, e)
                gi = mm(kslab_i, e)
            else:
                sel = s_ref[pl.ds((c % gpb) * kb, kb)]
                gr = mm(mm(kslab_r, sel), e)
                gi = mm(mm(kslab_i, sel), e)
            rr = rbar[pl.ds(c * f2p, f2p)].astype(jnp.float32)
            ri = ibar[pl.ds(c * f2p, f2p)].astype(jnp.float32)
            accr[:] = accr[:] + (gr * rr + gi * ri)
            acci[:] = acci[:] + (gr * ri - gi * rr)
            vr = vr_s[:]
            vi = vi_s[:]
            # one lane-full store: [re | im] K-grad partials concatenated on
            # the lane axis through a block-diag dblk-reduce — two separate
            # (f2p, cols) outputs each pad cols -> 128 lanes in HBM (2.0x,
            # 8.3 GB at the 1B seq-32k shape; this layout stores the same
            # bytes with zero padding)
            ek2 = ek_ref[0]                           # (2*dblk, 2*cols)
            a = jnp.concatenate([rr * vr + ri * vi, ri * vr - rr * vi],
                                axis=-1)              # (f2p, 2*dblk)
            ok_ref[0, 0, 0] = mm(a, ek2).astype(ok_ref.dtype)

        @pl.when(dl == nc - 1)
        def _():
            # staged adjoint of the segment rFFT: 2C * irfft(w (.) Vfbar),
            # 2C*w folded into the inverse untangle rows host-side
            mr = accr[pl.ds(0, n2)]
            mi_ = acci[pl.ds(0, n2)] * (1.0 - dc_ref[:])
            m_nyq = accr[pl.ds(n2, 1)]
            airw, aiiw = airw_ref[:], aiiw_ref[:]
            cirw, ciiw = cirw_ref[:], ciiw_ref[:]
            amr = airw * mr - aiiw * mi_
            ami = airw * mi_ + aiiw * mr
            cmr = cirw * mr + ciiw * mi_              # C' (.) conj(M)
            cmi = ciiw * mr - cirw * mi_
            sr = jnp.concatenate([amr, cmr], axis=-1)
            si = jnp.concatenate([ami, -cmi], axis=-1)
            tr, ti = pf.staged_dft(sr, si, i1r_ref[:], i1i_ref[:],
                                   itwr_ref[:], itwi_ref[:], i2r_ref[:],
                                   i2i_ref[:], f1, f2d, precision)
            b0rw = b0r * 2 * chunk
            b0iw = b0i * 2 * chunk
            z_r = tr[:, :dblk] + tr[:, dblk:] + b0rw * m_nyq
            z_i = ti[:, :dblk] - ti[:, dblk:] + b0iw * m_nyq
            sb = jnp.stack([z_r, z_i], axis=1).reshape(2 * chunk, dblk)
            ov_ref[0, 0] = sb.astype(ov_ref.dtype)

    return kernel, f2p


@functools.partial(jax.jit,
                   static_argnames=("chunk", "cols", "fast", "interpret",
                                    "dblk", "scr_bf16"))
def _fused_causal_bwd_call_v3(v, kfr, kfi, ybar, *, chunk, cols,
                              fast=False, interpret=False, dblk=None,
                              scr_bf16=None):
    import fft_tpu.kernels.pallas_fft as pf
    b, n, d = v.shape
    nc = n // chunk
    ncg = nc * cols
    f2 = chunk + 1
    d_g = d // cols
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)
    plan = _bwd_plan_v3(nc, chunk, d, cols, v.dtype.itemsize, fast)
    assert plan is not None or dblk, (nc, chunk, d)
    p_dblk, p_scr = plan if plan else (_DBLK, False)
    dblk = p_dblk if dblk is None else dblk
    scr_bf16 = p_scr if scr_bf16 is None else scr_bf16
    k_dtype = kfr.dtype
    if scr_bf16:
        kfr = kfr.astype(jnp.bfloat16)
        kfi = kfi.astype(jnp.bfloat16)
    sdt = jnp.bfloat16 if scr_bf16 else jnp.float32
    # K-grad partials always ride HBM in bf16 in fast mode, regardless of
    # the scratch dtype: at the 350M seq-32k shape they are (8, 272, 2056,
    # 64->128 lane-padded) per r/i — 2.13 GB each in f32, which alone
    # overflowed the 16 GB chip; the d/dblk partials are summed in f32
    # outside, so only one rounding step rides on each partial.
    kdt = jnp.bfloat16 if fast else jnp.float32
    kernel, f2p = _make_fused_bwd_kernel_v3(nc, chunk, cols, precision,
                                            dblk, scr_bf16)
    kb, gpb = _v3_kb(nc, cols)
    assert kb is not None, (nc, cols)
    cst = pf._consts(2 * chunk)
    n2 = cst["n2"]
    assert np.array_equal(cst["perm"], np.arange(n2)), "non-natural DFT order"

    # adjoint row scale for the accbar cache (delay identity, as v2 bwd)
    f_idx = np.arange(n2)
    coef = np.full(n2, 2.0, np.float32)
    coef[0] = 1.0
    s_rows = (coef * ((-1.0) ** f_idx) / (2 * chunk)).astype(np.float32)
    s_col = s_rows[:, None]
    s_nyq = np.float32(((-1.0) ** n2) / (2 * chunk))

    # adjoint-rfft weights folded into the inverse untangle rows
    w2c = np.full((n2, 1), float(chunk), np.float32)       # 2C * 1/2
    w2c[0] = 2.0 * chunk                                   # 2C * 1
    adj_rows = {
        "airw": np.asarray(cst["air"], np.float32) * w2c,
        "aiiw": np.asarray(cst["aii"], np.float32) * w2c,
        "cirw": np.asarray(cst["cir"], np.float32) * w2c,
        "ciiw": np.asarray(cst["cii"], np.float32) * w2c,
    }

    sel = np.zeros((gpb * kb, cols), np.float32)
    for r in range(gpb):
        for g in range(cols):
            sel[r * kb + r * cols + g, g] = 1.0

    njb = d // dblk
    e = np.zeros((njb, cols, dblk), np.float32)
    # block-diag dblk->cols reduce: maps the kernel's lane-concatenated
    # [re | im] partials (f2p, 2*dblk) to (f2p, 2*cols) in one matmul
    ek2 = np.zeros((njb, 2 * dblk, 2 * cols), np.float32)
    for jb in range(njb):
        for l in range(dblk):
            g = (jb * dblk + l) // d_g
            e[jb, g, l] = 1.0
            ek2[jb, l, g] = 1.0
            ek2[jb, dblk + l, cols + g] = 1.0

    sfr = s_col * np.asarray(cst["afr"], np.float32)
    sfi = s_col * np.asarray(cst["afi"], np.float32)
    sgr = s_col * np.asarray(cst["bfr"], np.float32)
    sgi = s_col * np.asarray(cst["bfi"], np.float32)
    snyq = np.full((1, 1), s_nyq, np.float32)

    v_pad = jnp.pad(v, ((0, 0), (chunk, 0), (0, 0)))

    const_specs = []
    const_args = []

    def add_const(arr):
        arr = np.asarray(arr, np.float32)
        const_specs.append(pl.BlockSpec(
            arr.shape, lambda i, jd, jj, dd, nd=arr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        const_args.append(jnp.asarray(arr))

    for name in ("i1r", "i1i", "itwr", "itwi", "i2r", "i2i"):
        add_const(cst[name])
    for name in ("airw", "aiiw", "cirw", "ciiw"):
        add_const(adj_rows[name])
    add_const(cst["dc"])
    for name in ("w1r", "w1i", "twr", "twi", "w2r", "w2i",
                 "afr", "afi", "bfr", "bfi"):
        add_const(cst[name])
    for arr in (sfr, sfi, sgr, sgi, snyq):
        add_const(arr)

    grid = (b, njb, nc, nc)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT)
    ov, ok = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((b, nc, 2 * chunk, d), v.dtype),
            jax.ShapeDtypeStruct((b, njb, nc * (nc + 1), f2p, 2 * cols),
                                 kdt),
        ),
        in_specs=[
            pl.BlockSpec((1, n, dblk), lambda i, jd, jj, dd: (i, 0, jd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, dblk),
                         lambda i, jd, jj, dd: (i, jj, jd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, dblk),
                         lambda i, jd, jj, dd: (i, jj + 1, jd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f2, kb),
                         lambda i, jd, jj, dd: (
                             i, dd, 0,
                             jnp.minimum(jj + dd, nc - 1) // gpb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f2, kb),
                         lambda i, jd, jj, dd: (
                             i, dd, 0,
                             jnp.minimum(jj + dd, nc - 1) // gpb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb * kb, cols), lambda i, jd, jj, dd: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols, dblk), lambda i, jd, jj, dd: (jd, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * dblk, 2 * cols),
                         lambda i, jd, jj, dd: (jd, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + const_specs,
        out_specs=(
            pl.BlockSpec((1, 1, 2 * chunk, dblk),
                         lambda i, jd, jj, dd: (i, jj, 0, jd),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, f2p, 2 * cols),
                         lambda i, jd, jj, dd: (
                             i, jd,
                             dd * (nc + 1) + jnp.minimum(jj + dd, nc),
                             0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((nc * f2p, dblk), sdt),
            pltpu.VMEM((f2p, dblk), jnp.float32),
            pltpu.VMEM((f2p, dblk), jnp.float32),
            pltpu.VMEM((f2p, dblk), jnp.float32),
            pltpu.VMEM((f2p, dblk), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(ybar.astype(v.dtype), v_pad, v_pad, kfr, kfi, jnp.asarray(sel),
      jnp.asarray(e), jnp.asarray(ek2), *const_args)

    # overlap-add the per-segment 2C taps onto the two chunks each covers
    seg = ov.astype(jnp.float32)
    vbar = seg[:, :, chunk:] + jnp.pad(
        seg[:, 1:, :chunk], ((0, 0), (0, 1), (0, 0), (0, 0)))
    vbar = vbar.reshape(b, n, d).astype(v.dtype)

    # K grads: split the lane-concatenated [re | im] partials, sum the dblk
    # partials, drop the trash row, zero the c < delta blocks (no primal
    # term -> no step ever writes them; the buffers hold whatever the DMA
    # flushed), fold (c, G) back onto the producer's lanes
    ok = jnp.sum(ok.astype(jnp.float32), axis=1)
    okr, oki = ok[..., :cols], ok[..., cols:]
    tri = jnp.asarray(np.triu(np.ones((nc, nc), bool))
                      )[None, :, :, None, None]       # [dl, c] = c >= dl
    okr = jnp.where(tri, okr.reshape(b, nc, nc + 1, f2p, cols)
                    [:, :, :nc, :f2], 0.0)            # garbage may be NaN
    oki = jnp.where(tri, oki.reshape(b, nc, nc + 1, f2p, cols)
                    [:, :, :nc, :f2], 0.0)
    kfr_bar = jnp.transpose(okr, (0, 1, 3, 2, 4)).reshape(
        b, nc, f2, ncg).astype(k_dtype)
    kfi_bar = jnp.transpose(oki, (0, 1, 3, 2, 4)).reshape(
        b, nc, f2, ncg).astype(k_dtype)
    return vbar, kfr_bar, kfi_bar
