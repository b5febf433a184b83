"""Fused Pallas spectral-mix kernel: rFFT -> gate multiply (+memory) ->
irFFT in ONE HBM pass (the BASELINE north-star kernel).

The unfused path costs ~10 HBM round trips of the (B, N, d) activation
(per-stage intermediates); this kernel reads v (and the broadcast gate)
once, does everything in VMEM on the MXU, and writes y once — measured ~6x
on the mix at N=1024 (see benchmarks/).

Design notes (all verified against Mosaic on the target chip):
- Complex arithmetic as split re/im f32 planes (Pallas has no complex).
- The packed real FFT needs Z[k] AND conj(Z[n2-k]); sublane flips are
  avoided entirely with the identity  conj(Z[n2-k]) = DFT_-(conj z)[k]:
  transforming zr and zi separately gives both P = F(zr) + i*F(zi) and
  Zc = F(zr) - i*F(zi) from ONE pair of real-input transforms.
- The inverse untangle's flip is likewise algebra-folded:
      irfft(M)[interleaved] = T_+(A (.) M) + T_-(C (.) conj M) + B0*M_nyq
  where A, C, B0 are precomputed constant rows (C absorbs the flipped
  coefficient (1 - i*u^k)/2, with C[0] = 0 and the k=0 term routed through
  the Nyquist row).  All data-dependent arrays flow through plain DFT
  stages.
- Each DFT of length n2 = f1*f2 is two dense matmul stages + a twiddle:
  stage 1 contracts the major factor via a 2D dot (f1, f1) @ (f1, f2*d);
  stage 2 is a 3D dot_general over the middle axis; output lands in
  k = c + f1*kq order which every constant row is built in — no reorder.
- Grid: (batch, d/128); everything for one (b, 128-channel) slab lives in
  VMEM, which bounds this kernel to n_fft <= ~2048 at 128 lanes (larger
  sizes fall back to the matmul-FFT path; a DMA-pipelined variant is the
  planned extension).

Reference semantics preserved exactly: the DC/Nyquist imaginary parts of
the mixed spectrum are dropped, matching torch.fft.irfft (spectre.py:551).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DBLK = 128
_PREC = jax.lax.Precision.HIGHEST
# Tests on CPU set this to run the kernel through the Pallas interpreter.
INTERPRET = False
# 16k-65536 two-pass kernel: parity-exact but not yet faster than the
# unfused composition on chip (see pallas_mix_supported docstring)
TWOPASS_ENABLE = False


def _mix_factors(n_fft: int):
    """(f1, f2) plan for the in-kernel DFT of length n2 = n_fft // 2.

    Unlike the generic matmul-FFT plan (which balances factors to minimize
    FLOPs), the kernel wants f1 as LARGE as possible: stage 1 is then a
    dense (128, 128) @ (128, f2*d) contraction — full MXU tiles — and the
    tiny-f2 stage 2 contributes negligible FLOPs.  Balanced factors (e.g.
    32 x 16 at n2=512) leave ~94% of the systolic array idle and measured
    3.7x off the HBM roofline in round 1.
    """
    if n_fft % 2 or n_fft < 8:
        return None
    n2 = n_fft // 2
    f1 = min(n2, 128)
    if n2 % f1:
        return None
    f2 = n2 // f1
    if f2 > 128:
        return None
    return f1, f2


def pallas_mix_supported(n_fft: int) -> bool:
    """<= 8192: whole-slab kernels (direct/staged).  16384-65536: the
    two-pass streamed kernel (`_twopass_mix_call`) — phase 1 computes the
    four-step block DFT into a VMEM spectrum scratch with one full-depth
    matmul, phase 2 walks fat kappa-chunks through twiddle -> stage-2 DFT
    -> untangle -> gate -> inverse, so VMEM never holds stage temporaries
    at full-slab size (dblk shrinks with n_fft to fit).

    TWOPASS_ENABLE gates the 16k+ sizes and currently defaults OFF: the
    kernel is parity-exact but measured 1.41 ms vs the unfused
    composition's 1.32 at 16k on v5e (its 3-D middle-dim contractions
    relayout every chunk), and the sub-128-lane reshape at 32k+ hits a
    Mosaic 'unsupported shape cast'.  Honest negative, recorded in
    RESULTS.md; the dispatch falls back to the matmul composition."""
    if _mix_factors(n_fft) is not None and n_fft <= 8192:
        return True
    return TWOPASS_ENABLE and _twopass_plan(n_fft) is not None


@functools.lru_cache(maxsize=None)
def _consts(n_fft: int) -> Tuple:
    """Host-side constant pack for the kernel (all numpy f32)."""
    n2 = n_fft // 2
    plan = _mix_factors(n_fft)
    assert plan is not None, n_fft
    f1, f2 = plan
    k1 = np.arange(f1)
    k2 = np.arange(f2)

    def dftm(p, sign):
        ang = (sign * 2 * np.pi / p) * np.outer(np.arange(p), np.arange(p))
        return np.exp(1j * ang).astype(np.complex64)

    def tw(sign):
        ang = (sign * 2 * np.pi / n2) * np.outer(k1, k2)
        return np.exp(1j * ang).astype(np.complex64)

    k = np.arange(n2)
    w = np.exp(-2j * np.pi * k / n_fft)               # e^{-2pi i k / n}
    u = np.exp(+2j * np.pi * k / n_fft)
    a_fwd = (1.0 - 1j * w) / 2.0                      # X = a*P + b*Zc
    b_fwd = (1.0 + 1j * w) / 2.0
    a_inv = (1.0 + 1j * u) / 2.0 / n2                 # fold 1/n2 into rows
    b_inv = (1.0 - 1j * u) / 2.0 / n2
    c_inv = np.zeros(n2, np.complex64)
    c_inv[1:] = b_inv[n2 - np.arange(1, n2)]          # C[j] = B[(n2-j)]
    b0 = b_inv[0]                                     # (1 - i)/(2 n2)

    # The staged transform emits index k' = c + f1*kq, NOT natural k.  All
    # per-frequency constant rows (a/b/c, gate is handled by the caller)
    # are therefore PRE-PERMUTED into that order so the kernel never
    # reorders data.  perm[k'] = natural k at position k'.
    kq, c = np.meshgrid(np.arange(f2), np.arange(f1), indexing="ij")
    perm = (c + f1 * kq).reshape(-1)                  # stage-order -> natural

    def rows(z):
        return (np.ascontiguousarray(z.real[perm, None]).astype(np.float32),
                np.ascontiguousarray(z.imag[perm, None]).astype(np.float32))

    dc_row = np.zeros((n2, 1), np.float32)
    dc_row[int(np.nonzero(perm == 0)[0][0])] = 1.0    # DC position in order

    m1 = dftm(f1, -1)
    m2 = dftm(f2, -1)
    i1 = dftm(f1, +1)
    i2 = dftm(f2, +1)
    t_f = tw(-1)
    t_i = tw(+1)

    return dict(
        n2=n2, f1=f1, f2=f2, perm=perm, b0=complex(b0),
        w1r=m1.real, w1i=m1.imag, w2r=m2.real, w2i=m2.imag,
        i1r=i1.real, i1i=i1.imag, i2r=i2.real, i2i=i2.imag,
        twr=t_f.real.astype(np.float32), twi=t_f.imag.astype(np.float32),
        itwr=t_i.real.astype(np.float32), itwi=t_i.imag.astype(np.float32),
        afr=rows(a_fwd)[0], afi=rows(a_fwd)[1],
        bfr=rows(b_fwd)[0], bfi=rows(b_fwd)[1],
        air=rows(a_inv)[0], aii=rows(a_inv)[1],
        cir=rows(c_inv)[0], cii=rows(c_inv)[1],
        dc=dc_row,
    )


def staged_dft(xr, xi, w1r, w1i, twr, twi, w2r, w2i, f1, f2, precision):
    """Two-stage complex DFT along sublanes of (n2, d); output in
    k = c + f1*kq ('stage') order.  ``xi=None`` marks real input
    (skips the zero matmuls).  Stage 1 is the dense (f1=128)-wide MXU
    contraction; stage 2 contracts the small remainder factor.  Shared by
    the fused-mix and fused-causal kernels (runs inside Pallas)."""
    n2 = f1 * f2
    d = xr.shape[-1]
    xr2 = xr.reshape(f1, f2 * d)

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    if xi is None:
        yr = mm(w1r, xr2)
        yi = mm(w1i, xr2)
    else:
        xi2 = xi.reshape(f1, f2 * d)
        yr = mm(w1r, xr2) - mm(w1i, xi2)
        yi = mm(w1r, xi2) + mm(w1i, xr2)
    if f2 == 1:
        return yr.reshape(n2, d), yi.reshape(n2, d)
    yr = yr.reshape(f1, f2, d)
    yi = yi.reshape(f1, f2, d)
    tr = twr[:, :, None]
    ti = twi[:, :, None]
    ur = yr * tr - yi * ti
    ui = yr * ti + yi * tr

    def mm3(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    vr = mm3(w2r, ur) - mm3(w2i, ui)               # (f2, f1, d)
    vi = mm3(w2r, ui) + mm3(w2i, ur)
    return vr.reshape(n2, d), vi.reshape(n2, d)


# ---------------------------------------------------------------------------
# Direct-matrix kernel (n_fft <= 2048, incl. the flagship 1024): the rFFT is
# ONE (F_half, N) @ (N, dblk) matmul pair and the irFFT ONE (N, F_half) @
# (F_half, dblk) pair, with every per-frequency constant (normalization, 2x
# mid-bin weights, the DC/Nyquist imaginary-drop, the (-1)^t Nyquist row)
# folded into the matrices.  The staged split-radix kernel spends ~50 VPU
# elementwise passes on packing/untangle/twiddle arithmetic — at N=1024
# that VPU time, not HBM, bounds it to ~27% of roofline.  Here the VPU does
# only the gate multiply; everything else is dense MXU work (~270 MFLOP per
# (batch, 128-lane) program at N=1024).  Both kernels compute the same
# linear map; tests compare them to the matmul-FFT composition.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _direct_consts(n_fft: int):
    """(Mr, Mi, Ar, Ai) numpy f32: X = (Mr + i Mi) @ v is the rFFT along
    rows; y = Ar @ Re(M) + Ai @ Im(M) is the irFFT with torch-compatible
    DC/Nyquist conventions (spectre.py:551) folded into the A columns."""
    f_half = n_fft // 2 + 1
    t = np.arange(n_fft)
    k = np.arange(f_half)
    ang = -2.0 * np.pi * np.outer(k, t) / n_fft
    mr = np.cos(ang).astype(np.float32)               # (F, N)
    mi = np.sin(ang).astype(np.float32)
    coef = np.full(f_half, 2.0)
    coef[0] = 1.0
    coef[-1] = 1.0
    ang2 = 2.0 * np.pi * np.outer(t, k) / n_fft
    ar = (coef * np.cos(ang2) / n_fft).astype(np.float32)   # (N, F)
    ai = (-coef * np.sin(ang2) / n_fft).astype(np.float32)
    ai[:, 0] = 0.0                                     # drop Im at DC
    ai[:, -1] = 0.0                                    # ... and Nyquist
    return mr, mi, ar, ai


def _make_direct_kernel(n_fft: int, with_memory: bool, precision, dblk: int,
                        split2: bool = False):
    f_half = n_fft // 2 + 1

    def kernel(*refs):
        if with_memory:
            (v_ref, gr_ref, gi_ref, e_ref, mt_ref,
             dm_ref, aa_ref) = refs[:-1]
        else:
            (v_ref, gr_ref, gi_ref, e_ref,
             dm_ref, aa_ref) = refs[:-1]
        o_ref = refs[-1]

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        e_mat = e_ref[0]                               # (HG, dblk) one-hot

        def expand(g, em):
            return jax.lax.dot_general(
                g, em, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        def run(v, em, gr, gi):
            # ONE stacked matmul gives Re and Im rows together
            # ([Mr; Mi] @ v); likewise the inverse contracts
            # [Ar | Ai] @ [mxr; mxi] in one call — half the MXU
            # dispatches of the r/i-split formulation (the VPU gate
            # multiply between them no longer drains the MXU pipe twice)
            x = mm(dm_ref[:], v)                       # (2F, cols)
            xr, xi = x[:f_half], x[f_half:]
            g_r = expand(gr, em)
            g_i = expand(gi, em)
            mxr = g_r * xr - g_i * xi
            mxi = g_r * xi + g_i * xr
            return mm(aa_ref[:], jnp.concatenate([mxr, mxi], axis=0))

        v = v_ref[0].astype(jnp.float32)               # (N, dblk)
        if split2 and dblk >= 256:
            # two independent half-width chains: the scheduler can
            # overlap one half's VPU gate with the other half's MXU pass
            # instead of serializing MXU -> VPU -> MXU per program
            h = dblk // 2
            y = jnp.concatenate(
                [run(v[:, :h], e_mat[:, :h], gr_ref[0], gi_ref[0]),
                 run(v[:, h:], e_mat[:, h:], gr_ref[0], gi_ref[0])],
                axis=1)
        else:
            y = run(v, e_mat, gr_ref[0], gi_ref[0])
        if with_memory:
            # frozen spectral memory enters additively; its irFFT is a
            # per-layer constant, precomputed time-domain and added here
            # (cheaper than streaming (F, dblk) re/im pairs through VMEM)
            y = y + mt_ref[:]
        o_ref[0] = y.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "interpret", "fast", "dblk",
                                    "split2"))
def _direct_mix_call(v, g_r, g_i, mem_t, *, n_fft, interpret=False,
                     fast=False, dblk=None, split2=False):
    b, n, d = v.shape
    with_memory = mem_t is not None
    f_half = n_fft // 2 + 1
    if dblk is None:
        # Wider blocks reuse each resident M/A weight tile across more
        # output lanes (fewer MXU weight reloads).  Measured on v5e at the
        # flagship shape (N=1024, B=8, d=512, bf16, slope-timed twice):
        # 128 = 0.149-0.152 ms, 256 = 0.126-0.130, 512 = 0.124-0.133 —
        # 256/512 tie within noise; both clearly beat 128.
        dblk = (512 if d % 512 == 0 else
                256 if d % 256 == 0 else _DBLK)
        if not fast and n_fft >= 2048:
            # exact mode: HIGHEST-precision multi-pass dots inflate the
            # scoped-VMEM stack; dblk 512 at n_fft 2048 measured 5 MB
            # over the 116 MB limit inside deep scan chains
            dblk = min(dblk, 256)
    precision = jax.lax.Precision.DEFAULT if fast else _PREC
    kernel = _make_direct_kernel(n_fft, with_memory, precision, dblk,
                                 split2)
    mr, mi, ar, ai = _direct_consts(n_fft)
    dm = np.concatenate([mr, mi], axis=0)              # (2F, N)
    aa = np.concatenate([ar, ai], axis=1)              # (N, 2F)

    grid = (b, d // dblk)
    hg = g_r.shape[-1]
    d_per_col = d // hg
    blk = np.zeros((d // dblk, hg, dblk), np.float32)
    for j in range(d // dblk):
        for l in range(dblk):
            blk[j, (j * dblk + l) // d_per_col, l] = 1.0

    data_specs = [
        pl.BlockSpec((1, n, dblk), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f_half, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f_half, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, dblk), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [v, g_r, g_i, jnp.asarray(blk)]
    if with_memory:
        data_specs += [
            pl.BlockSpec((n, dblk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        args += [mem_t]
    for arr in (dm, aa):
        data_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM))
        args.append(jnp.asarray(arr))

    kwargs = {}
    if not interpret:
        from fft_tpu.kernels.pallas_causal import _VMEM_LIMIT
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, n, d), v.dtype),
        in_specs=data_specs,
        out_specs=pl.BlockSpec((1, n, dblk), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(*args)
    return out


def _make_direct_bwd_kernel(n_fft: int, precision, dblk: int, njblk: int):
    f_half = n_fft // 2 + 1

    def kernel(v_ref, yb_ref, gr_ref, gi_ref, e_ref, cf_ref, icf_ref,
               dm_ref, aa_ref, vb_ref, gbr_ref, gbi_ref):
        j = pl.program_id(1)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        v = v_ref[0].astype(jnp.float32)               # (N, dblk)
        yb = yb_ref[0].astype(jnp.float32)             # (N, dblk)
        # one stacked pass gives the forward spectrum (of v) and the
        # adjoint-inverse spectrum (of ybar) together:
        #   Ar^T = diag(coef/n) Mr,  Ai^T = diag(coef/n) Mi
        # so u = aa^T @ ybar == cf * (dm @ ybar) — same constant matrix.
        w = mm(dm_ref[:], jnp.concatenate([yb, v], axis=1))  # (2F, 2*dblk)
        cf = cf_ref[:]                                 # (F, 1)
        ur = cf * w[:f_half, :dblk]
        ui = cf * w[f_half:, :dblk]
        xr = w[:f_half, dblk:]
        xi = w[f_half:, dblk:]

        e_mat = e_ref[0]                               # (HG, dblk) one-hot

        def expand(g):
            return jax.lax.dot_general(
                g, e_mat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        g_r = expand(gr_ref[0])
        g_i = expand(gi_ref[0])
        # cotangents of the mixed spectrum are (ur, ui); chain through the
        # complex gate multiply (mx = g * x):
        xr_bar = g_r * ur + g_i * ui
        xi_bar = g_r * ui - g_i * ur
        # vbar = Mr^T @ xr_bar + Mi^T @ xi_bar == aa @ (icf * [xr; xi]_bar)
        icf = icf_ref[:]                               # (F, 1)
        vb = mm(aa_ref[:], jnp.concatenate(
            [icf * xr_bar, icf * xi_bar], axis=0))     # (N, dblk)
        vb_ref[0] = vb.astype(vb_ref.dtype)

        # gate cotangents, reduced onto the compact (F, HG) columns
        gfr = ur * xr + ui * xi
        gfi = ui * xr - ur * xi

        def reduce_cols(gf):
            return jax.lax.dot_general(
                gf, e_mat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        gbr = reduce_cols(gfr)
        gbi = reduce_cols(gfi)
        if njblk == 1:
            gbr_ref[0] = gbr
            gbi_ref[0] = gbi
        else:
            @pl.when(j == 0)
            def _init():
                gbr_ref[0] = gbr
                gbi_ref[0] = gbi

            @pl.when(j > 0)
            def _acc():
                gbr_ref[0] += gbr
                gbi_ref[0] += gbi

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "interpret", "fast", "dblk"))
def _direct_mix_bwd_call(v, g_r, g_i, ybar, *, n_fft, interpret=False,
                         fast=False, dblk=None):
    """Fused adjoint of the direct-matrix mix: (vbar, gbar_r, gbar_i) in
    one pass (3 stacked matmuls on the SAME dm/aa constants as the
    forward; the jnp.vjp fallback costs ~6x the forward in HBM
    round-trips)."""
    b, n, d = v.shape
    f_half = n_fft // 2 + 1
    if dblk is None:
        dblk = (512 if d % 512 == 0 else
                256 if d % 256 == 0 else _DBLK)
    njblk = d // dblk
    precision = jax.lax.Precision.DEFAULT if fast else _PREC
    kernel = _make_direct_bwd_kernel(n_fft, precision, dblk, njblk)
    mr, mi, ar, ai = _direct_consts(n_fft)
    dm = np.concatenate([mr, mi], axis=0)              # (2F, N)
    aa = np.concatenate([ar, ai], axis=1)              # (N, 2F)
    t = np.arange(n_fft)
    coef = np.full(f_half, 2.0)
    coef[0] = 1.0
    coef[-1] = 1.0
    cf = (coef / n_fft).astype(np.float32).reshape(f_half, 1)
    icf = (n_fft / coef).astype(np.float32).reshape(f_half, 1)
    del t

    grid = (b, njblk)
    hg = g_r.shape[-1]
    d_per_col = d // hg
    blk = np.zeros((njblk, hg, dblk), np.float32)
    for j in range(njblk):
        for l in range(dblk):
            blk[j, (j * dblk + l) // d_per_col, l] = 1.0

    data_specs = [
        pl.BlockSpec((1, n, dblk), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, dblk), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f_half, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f_half, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, dblk), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [v, ybar, g_r, g_i, jnp.asarray(blk)]
    for arr in (cf, icf, dm, aa):
        data_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, nd=arr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        args.append(jnp.asarray(arr))

    kwargs = {}
    if not interpret:
        from fft_tpu.kernels.pallas_causal import _VMEM_LIMIT
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",
                                 "parallel" if njblk == 1 else "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT)
    out_shapes = (
        jax.ShapeDtypeStruct((b, n, d), v.dtype),
        jax.ShapeDtypeStruct((b, f_half, hg), jnp.float32),
        jax.ShapeDtypeStruct((b, f_half, hg), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, n, dblk), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f_half, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f_half, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=data_specs,
        out_specs=out_specs,
        interpret=interpret,
        **kwargs,
    )(*args)


def _direct_supported(n_fft: int) -> bool:
    """Direct-matrix kernel bound: MXU work scales with N^2 per column.
    Same-process A/B on v5e at 8192 tokens (fast mode, dblk=256):
    1024 = 0.136 ms direct vs 0.459 staged; 2048 = 0.258 vs 0.374 —
    direct wins through 2048; past that the N^2 matrices lose to the
    staged split-radix kernel (and stop fitting VMEM at 8k)."""
    return n_fft % 2 == 0 and 8 <= n_fft <= 2048


def _make_kernel(n_fft: int, with_memory: bool, precision=_PREC,
                 dblk: int = _DBLK):
    cst = _consts(n_fft)
    n2, f1, f2 = cst["n2"], cst["f1"], cst["f2"]
    b0r, b0i = cst["b0"].real, cst["b0"].imag

    def dft_stages(xr, xi, w1r, w1i, twr, twi, w2r, w2i):
        return staged_dft(xr, xi, w1r, w1i, twr, twi, w2r, w2i,
                          f1, f2, precision)

    def kernel(*refs):
        if with_memory:
            (v_ref, gr_ref, gi_ref, gn_ref, e_ref, mr_ref, mi_ref, mn_ref,
             *c_refs) = refs[:-1]
        else:
            v_ref, gr_ref, gi_ref, gn_ref, e_ref, *c_refs = refs[:-1]
        o_ref = refs[-1]
        (w1r, w1i, twr, twi, w2r, w2i,
         i1r, i1i, itwr, itwi, i2r, i2i,
         afr, afi, bfr, bfi, air, aii, cir, cii, dc) = (
            r[:] for r in c_refs)

        v = v_ref[0].astype(jnp.float32)               # (N, dblk)
        zr = v.reshape(n2, 2, dblk)[:, 0, :]
        zi = v.reshape(n2, 2, dblk)[:, 1, :]

        # one pair of real-input transforms gives P and Zc; both run in a
        # single lane-stacked pass: v.reshape(n2, 2*DBLK) IS [zr | zi]
        # lane-concatenated for free (row m = [v[2m,:], v[2m+1,:]])
        zs = v.reshape(n2, 2 * dblk)
        fsr, fsi = dft_stages(zs, None, w1r, w1i, twr, twi, w2r, w2i)
        frr, fir = fsr[:, :dblk], fsr[:, dblk:]
        fri, fii = fsi[:, :dblk], fsi[:, dblk:]
        pr = frr - fii
        pi = fri + fir
        zcr = frr + fii
        zci = fri - fir

        # forward untangle: X = a*P + b*Zc  (rows pre-permuted)
        xr = afr * pr - afi * pi + bfr * zcr - bfi * zci
        xi = afr * pi + afi * pr + bfr * zci + bfi * zcr
        # Nyquist (real): X_nyq = Re(Z[0]) - Im(Z[0]); Z[0] = sum z = P at
        # the DC position == sum over rows of z (cheaper than locating DC).
        x_nyq = jnp.sum(zr - zi, axis=0, keepdims=True)  # (1, 128)

        # gate multiply (+ memory), irfft DC/Nyquist convention.  The gate
        # arrives COMPACT (one column per head-group); expansion to the 128
        # channels of this block is a one-hot matmul (Mosaic rejects lane
        # repeats; the MXU does this for free).
        e_mat = e_ref[0]                               # (HG, 128) one-hot
        def expand(g):
            # precision matters even for a one-hot matmul: DEFAULT runs a
            # single bf16 pass that truncates the f32 gate (caught by the
            # real-chip smoke test at 1.6e-3 rel in exact mode)
            return jax.lax.dot_general(
                g, e_mat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        g_r = expand(gr_ref[0])
        g_i = expand(gi_ref[0])
        mr = g_r * xr - g_i * xi
        mi = g_r * xi + g_i * xr
        m_nyq = expand(gn_ref[0]) * x_nyq
        if with_memory:
            mr = mr + mr_ref[:]
            mi = mi + mi_ref[:]
            m_nyq = m_nyq + mn_ref[:]
        mi = mi * (1.0 - dc)                           # drop Im at DC

        # inverse: z' = T+(A (.) M) + T-(C (.) conj M) + B0 * M_nyq.
        # T-(x) = conj(T+(conj x)), so BOTH terms ride ONE lane-stacked
        # T+ transform (half the matmul dispatches of two narrow calls).
        amr = air * mr - aii * mi
        ami = air * mi + aii * mr
        cmr = cir * mr + cii * mi                      # C (.) conj(M)
        cmi = cii * mr - cir * mi
        sr = jnp.concatenate([amr, cmr], axis=-1)      # (n2, 2*dblk)
        si = jnp.concatenate([ami, -cmi], axis=-1)
        tr, ti = dft_stages(sr, si, i1r, i1i, itwr, itwi, i2r, i2i)
        z_r = tr[:, :dblk] + tr[:, dblk:] + b0r * m_nyq
        z_i = ti[:, :dblk] - ti[:, dblk:] + b0i * m_nyq

        y = jnp.stack([z_r, z_i], axis=1).reshape(n_fft, dblk)
        o_ref[0] = y.astype(o_ref.dtype)

    return kernel, cst


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "interpret", "fast"))
def _fused_mix_call(v, g_r, g_i, g_nyq, mem_r, mem_i, mem_nyq, *, n_fft,
                    interpret=False, fast=False):
    b, n, d = v.shape
    with_memory = mem_r is not None
    # Channel block width.  Measured on v5e at n=1024: 128 = 0.304 ms,
    # 256 = 0.321 ms, 512 = VMEM OOM (~10 live (n2, 2*dblk) f32 buffers) —
    # the kernel is not dispatch-bound, so stay at the minimum tile.
    dblk = _DBLK
    # fast=True uses single-pass bf16 MXU passes (~4e-3 rel, fits the bf16
    # budget and is ~2.4x the HIGHEST-precision kernel); fast=False keeps
    # fp32-accurate 6-pass matmuls (2e-7).
    kernel, cst = _make_kernel(
        n_fft, with_memory,
        precision=jax.lax.Precision.DEFAULT if fast else _PREC, dblk=dblk)
    n2 = cst["n2"]

    grid = (b, d // dblk)
    hg = g_r.shape[-1]                      # compact gate columns (H*G)
    data_specs = [
        pl.BlockSpec((1, n, dblk), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n2, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n2, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hg), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, dblk), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # one-hot channel->group expansion per d-block
    d_per_col = d // hg
    blk = np.zeros((d // dblk, hg, dblk), np.float32)
    for j in range(d // dblk):
        for l in range(dblk):
            blk[j, (j * dblk + l) // d_per_col, l] = 1.0
    args = [v, g_r, g_i, g_nyq, jnp.asarray(blk)]
    if with_memory:
        data_specs += [
            pl.BlockSpec((n2, dblk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, dblk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dblk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        args += [mem_r, mem_i, mem_nyq]

    const_names = ["w1r", "w1i", "twr", "twi", "w2r", "w2i",
                   "i1r", "i1i", "itwr", "itwi", "i2r", "i2i",
                   "afr", "afi", "bfr", "bfi", "air", "aii",
                   "cir", "cii", "dc"]
    for name in const_names:
        arr = np.asarray(cst[name], np.float32)
        data_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, nd=arr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        args.append(jnp.asarray(arr))

    kwargs = {}
    if not interpret:
        # no cross-step state: let Mosaic schedule grid steps freely.
        # vmem_limit_bytes: the chip has 128 MB; XLA's default scoped
        # limit (16 MB) rejects n_fft > 2048 (~10 live (n2, 2*dblk) f32
        # stage buffers) — raised limit probed/verified on v5e.
        from fft_tpu.kernels.pallas_causal import _VMEM_LIMIT
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, n, dblk * grid[1]), v.dtype),
        in_specs=data_specs,
        out_specs=pl.BlockSpec((1, n, dblk), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(*args)
    return out


def fused_spectral_mix(
    v: jnp.ndarray,                    # (B, N, d) real, N == n_fft
    gate_bc: jnp.ndarray,              # (B, F_half, d) complex
    memory_fft: Optional[jnp.ndarray],  # (F_half, d) complex or None
    *,
    n_fft: int,
    interpret: bool = None,
    fast: bool = False,
) -> jnp.ndarray:
    """y = irfft(gate_bc * rfft(v) [+ memory], n_fft) fused in one pass.

    The gate (and memory) arrive on the natural frequency grid; their rows
    are permuted host-side into the kernel's stage order (a cheap static
    gather on the small-F arrays, fused by XLA)."""
    if interpret is None:
        interpret = INTERPRET
    assert pallas_mix_supported(n_fft), n_fft
    b, n, d = v.shape
    assert n == n_fft and d % _DBLK == 0, (v.shape, n_fft)
    hg = gate_bc.shape[-1]                # compact (B, F_half, H*G) or full d
    assert d % hg == 0 and (d // hg) * hg == d, (d, hg)

    if _direct_supported(n_fft):
        g = gate_bc.astype(jnp.complex64)
        mem_t = None
        if memory_fft is not None:
            # memory enters additively (mixed + mem before the irFFT), so
            # its contribution is the constant irfft(mem) — precompute it
            # in time domain (one small matmul pair on the dense-A consts;
            # bf16 single-pass in fast mode) and let the kernel add it as
            # an output bias.
            _, _, ar, ai = _direct_consts(n_fft)
            prec = (jax.lax.Precision.DEFAULT if fast
                    else jax.lax.Precision.HIGHEST)
            m = memory_fft.astype(jnp.complex64)
            mem_t = (jnp.matmul(jnp.asarray(ar), jnp.real(m),
                                precision=prec)
                     + jnp.matmul(jnp.asarray(ai), jnp.imag(m),
                                  precision=prec))
        return _direct_mix_call(v, jnp.real(g), jnp.imag(g), mem_t,
                                n_fft=n_fft, interpret=interpret, fast=fast)

    if n_fft > 8192:
        tp = _twopass_consts(n_fft)
        perm = jnp.asarray(tp["perm"])
        g = gate_bc.astype(jnp.complex64)
        g_main = jnp.take(g, perm, axis=-2)
        y = _twopass_mix_call(
            v, jnp.real(g_main), jnp.imag(g_main),
            jnp.real(g[..., -1:, :]),
            n_fft=n_fft, interpret=interpret, fast=fast)
        if memory_fft is not None:
            # additive frozen memory: its irFFT is a per-layer constant —
            # computed once via the matmul FFT and broadcast-added (no
            # 16k+ preset uses memory; the extra pass only costs when on)
            from fft_tpu.kernels.matfft import irfft_matmul
            prec = (jax.lax.Precision.DEFAULT if fast
                    else jax.lax.Precision.HIGHEST)
            mem_t = irfft_matmul(memory_fft.astype(jnp.complex64)[None],
                                 n_fft, axis=-2, precision=prec)[0]
            y = (y.astype(jnp.float32) + mem_t).astype(v.dtype)
        return y

    cst = _consts(n_fft)
    perm = jnp.asarray(cst["perm"])

    g = gate_bc.astype(jnp.complex64)
    g_main = jnp.take(g, perm, axis=-2)
    g_r = jnp.real(g_main)
    g_i = jnp.imag(g_main)
    g_nyq = jnp.real(g[..., -1:, :])                  # only Re survives

    mem_r = mem_i = mem_nyq = None
    if memory_fft is not None:
        m = memory_fft.astype(jnp.complex64)
        m_main = jnp.take(m, perm, axis=-2)
        mem_r = jnp.real(m_main)
        mem_i = jnp.imag(m_main)        # DC Im dropped in-kernel on the sum
        mem_nyq = jnp.real(m[..., -1:, :]).reshape(1, d)
    return _fused_mix_call(v, g_r, g_i, g_nyq, mem_r, mem_i, mem_nyq,
                           n_fft=n_fft, interpret=interpret, fast=fast)


def _unfused_mix(v, gate_bc, memory_fft, n_fft, fast=False):
    """Reference composition through the matmul FFT (same math; used for
    the backward pass and as the fallback).  Accepts the compact
    (B, F_half, H*G) gate and broadcasts it over channels."""
    from fft_tpu.kernels.matfft import (irfft_matmul, mix_matmul_bf16,
                                        plan_factors, rfft_matmul)
    if (fast and memory_fft is None and n_fft >= 16384 and v.ndim == 3
            and v.shape[-2] == n_fft
            and v.shape[-1] % gate_bc.shape[-1] == 0
            and plan_factors(n_fft) is not None):
        # Past the fused kernels' reach the composition is HBM-PASS-bound
        # (roofline rows: 10-11% of the MXU bound at 16k/32k) — the
        # split-real bf16-resident variant halves the bytes of every
        # full-size pass.  Fast mode only; exact keeps f32 complex.
        return mix_matmul_bf16(v, jnp.real(gate_bc).astype(jnp.float32),
                               jnp.imag(gate_bc).astype(jnp.float32),
                               n_fft)
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    d = v.shape[-1]
    if gate_bc.shape[-1] != d:
        gate_bc = jnp.repeat(gate_bc, d // gate_bc.shape[-1], axis=-1)
    mixed = gate_bc * rfft_matmul(v, n_fft, axis=-2, precision=prec)
    if memory_fft is not None:
        mixed = mixed + memory_fft
    return irfft_matmul(mixed, n_fft, axis=-2,
                        precision=prec).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spectral_mix(v, gate_bc, memory_fft, n_fft: int, fast: bool = False):
    """Differentiable fused spectral mix: Pallas forward, exact adjoint
    backward via the (autodiff'd) matmul-FFT composition.  The operator is
    bilinear in (v, gate) so the unfused VJP is the exact gradient of the
    fused forward (both compute the same linear map to ~1e-7)."""
    return fused_spectral_mix(v, gate_bc, memory_fft, n_fft=n_fft,
                              fast=fast)


def _mix_fwd(v, gate_bc, memory_fft, n_fft, fast):
    return spectral_mix(v, gate_bc, memory_fft, n_fft, fast), (
        v, gate_bc, memory_fft)


def _mix_bwd(n_fft, fast, res, ybar):
    v, gate_bc, memory_fft = res
    b, n, d = v.shape
    hg = gate_bc.shape[-1]
    # fast mode only: measured on v5e at the flagship shape the fused
    # adjoint is 0.18 vs 0.50 ms (jax.vjp of the matmul composition) in
    # bf16, but LOSES in exact mode (1.03 vs 0.69 — HIGHEST-precision
    # dots make the direct N^2 matmuls 6-pass; the factored FFT does
    # fewer FLOPs there).  benchmarks/ablate_mix_bwd.py.
    if (fast and _direct_supported(n_fft) and n == n_fft
            and d % _DBLK == 0 and d % hg == 0):
        g = gate_bc.astype(jnp.complex64)
        vbar, gbr, gbi = _direct_mix_bwd_call(
            v, jnp.real(g), jnp.imag(g), ybar.astype(v.dtype),
            n_fft=n_fft, interpret=INTERPRET, fast=fast)
        # JAX's complex cotangent convention is conj(dL/dre + i dL/dim)
        gbar = jax.lax.complex(gbr, -gbi).astype(gate_bc.dtype)
        membar = None
        if memory_fft is not None:
            # mem enters additively: membar = aa^T @ (sum_b ybar), done
            # outside the kernel (DCE'd entirely when memory is frozen
            # behind stop_gradient).
            prec = (jax.lax.Precision.DEFAULT if fast
                    else jax.lax.Precision.HIGHEST)
            _, _, ar, ai = _direct_consts(n_fft)
            ys = jnp.sum(ybar.astype(jnp.float32), axis=0)
            mbr = jnp.matmul(jnp.asarray(ar.T), ys, precision=prec)
            mbi = jnp.matmul(jnp.asarray(ai.T), ys, precision=prec)
            membar = jax.lax.complex(mbr, -mbi).astype(memory_fft.dtype)
        return vbar, gbar, membar
    _, vjp = jax.vjp(
        lambda v, g, m: _unfused_mix(v, g, m, n_fft, fast),
        v, gate_bc, memory_fft)
    return vjp(ybar)


spectral_mix.defvjp(_mix_fwd, _mix_bwd)


# ---------------------------------------------------------------------------
# Two-pass streamed kernel (n_fft 16384-65536).  The whole-slab staged
# kernel dies past 8192 because its ~10 live (n2, 2*dblk) f32 stage buffers
# outgrow VMEM.  Here the packed-real DFT of length n2 = f1*f2 is run as
# the four-step algorithm with the kappa factor split across a SEQUENTIAL
# grid axis:
#
#   z[m], m = q*f1 + c                 (contiguous f1-row blocks, q in f2)
#   S[kappa, c]   = sum_q z[q f1 + c] e^{-2pi i q kappa / f2}     (phase 1)
#   X[kappa+f2 k1] = sum_c e^{-2pi i c k1/f1} (e^{-2pi i c kappa/n2} S)
#                                                                 (phase 2)
#
# Step 0 (phase 1) computes S in ONE full-depth (f2, f2) @ (f2, f1*2dblk)
# matmul — the v block is small enough to sit resident once dblk is chosen
# by the VMEM model below, so no q-streaming/accumulation is needed (the
# first cut of this kernel accumulated S over qc-row steps and the output
# over kc=8-row chunks; those depth-8/16 matmuls plus the full-scratch
# read-modify-write per step measured SLOWER than the unfused composition
# — 1.79 vs 1.31 ms at 16k).  Steps 1..nk each process a FAT kappa-chunk
# (kc rows, kc*f1*2dblk*4 bounded by a temporaries budget): twiddle ->
# stage-2 DFT (depth f1=128) -> real-FFT untangle -> gate -> inverse
# untangle -> inverse stage -> inverse twiddle, then one depth-kc
# q-contraction accumulated into the output scratch (nk <= 4, so the
# accumulator is touched at most 4 times).  dblk shrinks with n_fft
# (64/64/32 at 16k/32k/64k) to keep everything — v block, spectrum
# scratches, accumulator, chunk temporaries — inside the ~116 MB scoped
# VMEM; the whole transform runs with NO HBM round trips between stages.
#
# The T- branch of the inverse untangle rides the same transforms via the
# conj identity (T-(x) = conj(T+(conj x))): the am/cm planes are
# lane-stacked through the per-chunk inverse stage, and the final
# q-contraction merges them with W+ only:
#   Re z' = W+r @ (v+r + v-r) + W+i @ (v-i - v+i)
#   Im z' = W+r @ (v+i + v-i) + W+i @ (v+r - v-r)
# so ONE complex accumulator (re|im lane-stacked) suffices.
#
# Reference semantics identical to the other kernels (spectre.py:506,551
# call sites; DC/Nyquist imaginary drop per torch.fft.irfft).
# ---------------------------------------------------------------------------

# dblk halves as n_fft doubles so every VMEM resident scales O(1):
# spectrum scratches 2*(n2*2dblk*4) = 33.5 MB, accumulator 16.8, chunk
# temporaries ~31 (kc = f2/4 keeps per-chunk arrays at 2.1 MB), v/out
# blocks <= 8.4 each — ~100 MB total at every size, inside the ~116 MB
# scoped limit.  The kernel works on a (b, nj, n, dblk) folded layout
# (block == array dims satisfies Mosaic's last-two-dims rule for any
# dblk); the fold/unfold transposes are one XLA copy each.
_TP_DBLK = {16384: 128, 32768: 64, 65536: 32}


def _twopass_plan(n_fft: int):
    """(f1, f2, kc, dblk) or None."""
    dblk = _TP_DBLK.get(n_fft)
    if dblk is None:
        return None
    n2 = n_fft // 2
    f1 = 128
    f2 = n2 // f1
    kc = f2 // 4
    return f1, f2, kc, dblk


@functools.lru_cache(maxsize=None)
def _twopass_consts(n_fft: int):
    """Host-side constant pack; all rows permuted into the kernel's
    chunk-major (chunk, k1, kappa_in_chunk) row order."""
    plan = _twopass_plan(n_fft)
    assert plan is not None, n_fft
    f1, f2, kc, dblk = plan
    n2 = n_fft // 2
    nk = f2 // kc

    # kernel row r = ci*(f1*kc) + k1*kc + ki  ->  natural k
    ci, k1, ki = np.meshgrid(np.arange(nk), np.arange(f1), np.arange(kc),
                             indexing="ij")
    perm = ((ci * kc + ki) + f2 * k1).reshape(-1)

    k = np.arange(n2)
    w = np.exp(-2j * np.pi * k / n_fft)
    u = np.exp(+2j * np.pi * k / n_fft)
    a_fwd = (1.0 - 1j * w) / 2.0
    b_fwd = (1.0 + 1j * w) / 2.0
    a_inv = (1.0 + 1j * u) / 2.0 / n2
    b_inv = (1.0 - 1j * u) / 2.0 / n2
    c_inv = np.zeros(n2, np.complex64)
    c_inv[1:] = b_inv[n2 - np.arange(1, n2)]

    def rows(z):
        zp = z[perm]
        return (np.ascontiguousarray(zp.real[:, None]).astype(np.float32),
                np.ascontiguousarray(zp.imag[:, None]).astype(np.float32))

    dc = np.zeros((n2, 1), np.float32)
    dc[int(np.nonzero(perm == 0)[0][0])] = 1.0

    q = np.arange(f2)
    kap = np.arange(f2)
    # phase-1 block DFT, ONE full-depth (f2, f2) matmul
    w2 = np.exp(-2j * np.pi * np.outer(kap, q) / f2)
    # inverse q-contraction columns, one (f2, kc) block per chunk
    wi = np.exp(+2j * np.pi * np.outer(q, kap) / f2)
    wib = wi.reshape(f2, nk, kc).transpose(1, 0, 2)          # (nk, f2, kc)
    # per-chunk twiddles
    c_ = np.arange(f1)
    twf = np.exp(-2j * np.pi * np.outer(kap, c_) / n2)       # (f2, f1)
    twfb = twf.reshape(nk, kc, f1)
    twi_ = np.exp(+2j * np.pi * np.outer(c_, kap) / n2)      # (f1, f2)
    twib = twi_.reshape(f1, nk, kc).transpose(1, 0, 2)       # (nk, f1, kc)
    # stage DFT matrices over the f1 factor
    s1 = np.exp(-2j * np.pi * np.outer(c_, c_) / f1)         # [k1, c]
    is1 = np.exp(+2j * np.pi * np.outer(c_, c_) / f1)        # [c, k1]

    def f32(a):
        return np.ascontiguousarray(a).astype(np.float32)

    afr, afi = rows(a_fwd)
    air, aii = rows(a_inv)
    cir, cii = rows(c_inv)
    return dict(
        f1=f1, f2=f2, kc=kc, dblk=dblk, nk=nk, perm=perm,
        b0=complex(b_inv[0]),
        w2r=f32(w2.real), w2i=f32(w2.imag),
        wibr=f32(wib.real), wibi=f32(wib.imag),
        twfr=f32(twfb.real), twfi=f32(twfb.imag),
        twir=f32(twib.real), twii=f32(twib.imag),
        s1r=f32(s1.real), s1i=f32(s1.imag),
        is1r=f32(is1.real), is1i=f32(is1.imag),
        afr=afr, afi=afi, bfr=rows(b_fwd)[0], bfi=rows(b_fwd)[1],
        air=air, aii=aii, cir=cir, cii=cii, dc=dc,
    )


def _tp_phase2_body(sr, si, twfr, twfi, s1r, s1i, is1r, is1i,
                    afr, afi, bfr, bfi, air, aii, cir, cii, dc,
                    g_r, g_i, f1, kc, dblk, precision):
    """One kappa-chunk: twiddle -> stage-2 DFT -> untangle -> gate ->
    inverse untangle -> inverse stage -> inverse twiddle.  sr/si are the
    chunk's (kc, f1, 2*dblk) spectrum planes ([zr | zi] lane-stacked);
    returns the two (f1, kc, 2*dblk) operands of the q-contraction."""
    def mm3(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    tr_ = twfr[:, :, None]
    ti_ = twfi[:, :, None]
    ur = sr * tr_ - si * ti_
    ui = sr * ti_ + si * tr_
    # stage-2 DFT over c: (f1,f1)[k1,c] x (kc,f1,2dblk) -> (f1,kc,2dblk)
    xr = mm3(s1r, ur, (((1,), (1,)))) - mm3(s1i, ui, (((1,), (1,))))
    xi = mm3(s1r, ui, (((1,), (1,)))) + mm3(s1i, ur, (((1,), (1,))))
    xr = xr.reshape(f1 * kc, 2 * dblk)
    xi = xi.reshape(f1 * kc, 2 * dblk)
    frr, fir = xr[:, :dblk], xr[:, dblk:]
    fri, fii = xi[:, :dblk], xi[:, dblk:]
    pr = frr - fii
    pi = fri + fir
    zcr = frr + fii
    zci = fri - fir
    # forward untangle (rows pre-permuted to this chunk's order)
    xsr = afr * pr - afi * pi + bfr * zcr - bfi * zci
    xsi = afr * pi + afi * pr + bfr * zci + bfi * zcr
    # gate multiply; drop Im at DC (torch irfft convention)
    mr = g_r * xsr - g_i * xsi
    mi = (g_r * xsi + g_i * xsr) * (1.0 - dc)
    # inverse untangle; the C (.) conj(M) branch lane-stacks with A (.) M
    # and rides the same inverse stage/twiddle via the conj identity
    # T-(x) = conj(T+(conj x)) — conj folded at the q-contraction below.
    amr = air * mr - aii * mi
    ami = air * mi + aii * mr
    cmr = cir * mr + cii * mi
    cmi = cii * mr - cir * mi
    s2r = jnp.concatenate([amr, cmr], axis=-1).reshape(f1, kc, 2 * dblk)
    s2i = jnp.concatenate([ami, -cmi], axis=-1).reshape(f1, kc, 2 * dblk)
    # inverse stage over k1: (f1,f1)[c,k1] x (f1,kc,2dblk) -> (f1,kc,2dblk)
    rr = mm3(is1r, s2r, (((1,), (0,)))) - mm3(is1i, s2i, (((1,), (0,))))
    ri = mm3(is1r, s2i, (((1,), (0,)))) + mm3(is1i, s2r, (((1,), (0,))))
    return rr, ri


def _make_twopass_kernel(n_fft: int, precision, dblk: int):
    cst = _twopass_consts(n_fft)
    f1, f2, kc, nk = cst["f1"], cst["f2"], cst["kc"], cst["nk"]
    nsteps = 1 + nk
    n2 = n_fft // 2
    b0r, b0i = cst["b0"].real, cst["b0"].imag

    def kernel(*refs):
        (v_ref, gr_ref, gi_ref, gn_ref, e_ref,
         w2r_ref, w2i_ref, wib_r, wib_i, twf_r, twf_i, twi_r, twi_i,
         s1r_ref, s1i_ref, is1r_ref, is1i_ref,
         afr_ref, afi_ref, bfr_ref, bfi_ref,
         air_ref, aii_ref, cir_ref, cii_ref, dc_ref,
         o_ref, sr_scr, si_scr, acc_scr, nyq_scr) = refs
        step = pl.program_id(2)

        def mm(a, b):
            return jax.lax.dot_general(a, b, ((((1,), (0,))), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=precision)

        @pl.when(step == 0)
        def _phase1():
            # full-depth block DFT: z (f2, f1*2dblk) resident, ONE
            # (f2, f2) matmul pair writes the whole spectrum scratch
            blk = v_ref[0, 0].astype(jnp.float32)      # (n, dblk)
            zs = blk.reshape(n2, 2 * dblk)             # [z_re | z_im] lanes
            zq = zs.reshape(f2, f1 * 2 * dblk)
            sr_scr[:] = mm(w2r_ref[:], zq)
            si_scr[:] = mm(w2i_ref[:], zq)
            nyq_scr[0:1] = jnp.sum(zs[:, :dblk] - zs[:, dblk:], axis=0,
                                   keepdims=True)
            acc_scr[:] = jnp.zeros((n2, 2 * dblk), jnp.float32)

        @pl.when(step > 0)
        def _phase2():
            k0 = (step - 1) * kc
            sr = sr_scr[pl.ds(k0, kc)].reshape(kc, f1, 2 * dblk)
            si = si_scr[pl.ds(k0, kc)].reshape(kc, f1, 2 * dblk)
            e_mat = e_ref[0]

            def expand(g):
                return jax.lax.dot_general(
                    g, e_mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)

            g_r = expand(gr_ref[0])
            g_i = expand(gi_ref[0])
            rr, ri = _tp_phase2_body(
                sr, si, twf_r[0], twf_i[0],
                s1r_ref[:], s1i_ref[:], is1r_ref[:], is1i_ref[:],
                afr_ref[:], afi_ref[:], bfr_ref[:], bfi_ref[:],
                air_ref[:], aii_ref[:], cir_ref[:], cii_ref[:], dc_ref[:],
                g_r, g_i, f1, kc, dblk, precision)
            # inverse twiddle e^{+2pi i c kappa/n2}: constants (f1, kc)
            itr = twi_r[0][:, :, None]
            iti = twi_i[0][:, :, None]
            vr = rr * itr - ri * iti                  # (f1, kc, 2*dblk)
            vi = rr * iti + ri * itr
            # merge the two untangle branches into ONE complex accumulate:
            # lanes [0:dblk] = v+ (A-branch), [dblk:] = v~ with the actual
            # minus-branch value v- = conj(v~).  Then
            #   Re z' = W+r @ (v+r + v-r) + W+i @ (v-i - v+i)
            #   Im z' = W+r @ (v+i + v-i) + W+i @ (v+r - v-r)
            vpr, vtr = vr[..., :dblk], vr[..., dblk:]
            vpi, vti = vi[..., :dblk], vi[..., dblk:]
            p_ = jnp.concatenate(                     # [Re-part | Im-part]
                [vpr + vtr, vpi - vti], axis=-1)
            m_ = jnp.concatenate(
                [-vti - vpi, vpr - vtr], axis=-1)
            # q-contraction: (f2, kc) x_k (f1, kc, 2dblk) -> (f2, f1, 2dblk)
            def mmq(wblk, x):
                return jax.lax.dot_general(
                    wblk, x, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)

            contrib = mmq(wib_r[0], p_) + mmq(wib_i[0], m_)
            if nk == 1:
                acc = contrib.reshape(n2, 2 * dblk)
            else:
                acc_scr[:] = acc_scr[:] + contrib.reshape(n2, 2 * dblk)

            @pl.when(step == nsteps - 1)
            def _finalize():
                gn = jax.lax.dot_general(
                    gn_ref[0], e_mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision)
                m_nyq = gn * nyq_scr[0:1]
                a = acc if nk == 1 else acc_scr[:]
                z_r = a[:, :dblk] + b0r * m_nyq
                z_i = a[:, dblk:] + b0i * m_nyq
                y = jnp.stack([z_r, z_i], axis=1).reshape(n_fft, dblk)
                o_ref[0, 0] = y.astype(o_ref.dtype)

    return kernel, cst


@functools.partial(jax.jit, static_argnames=("n_fft", "interpret", "fast"))
def _twopass_mix_call(v, g_r, g_i, g_nyq, *, n_fft, interpret=False,
                      fast=False):
    """g_r/g_i arrive PRE-PERMUTED into the kernel's chunk-major row order
    (host-side gather in `fused_spectral_mix`); g_nyq is (B, 1, hg)."""
    b, n, d = v.shape
    assert n == n_fft
    plan = _twopass_plan(n_fft)
    f1, f2, kc, dblk = plan
    n2 = n_fft // 2
    assert d % dblk == 0, (d, dblk)
    precision = jax.lax.Precision.DEFAULT if fast else _PREC
    kernel, cst = _make_twopass_kernel(n_fft, precision, dblk)
    nk = cst["nk"]
    nsteps = 1 + nk
    hg = g_r.shape[-1]

    # one-hot group->channel expansion per d-block (Mosaic has no lane
    # repeat; the MXU does the broadcast)
    d_per_col = d // hg
    blk = np.zeros((d // dblk, hg, dblk), np.float32)
    for j in range(d // dblk):
        for l in range(dblk):
            blk[j, (j * dblk + l) // d_per_col, l] = 1.0

    def chunk_idx(s):
        return jnp.maximum(s - 1, 0)

    # fold the d-blocks into their own axis so the v/out blocks equal the
    # array dims (Mosaic's last-two-dims rule allows any dblk that way);
    # the full per-program v block is resident (index constant in s)
    nj = d // dblk
    vk = jnp.transpose(v.reshape(b, n, nj, dblk), (0, 2, 1, 3))
    data_specs = [pl.BlockSpec((1, 1, n, dblk),
                               lambda i, j, s: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)]
    args = [vk]

    # gate (pre-permuted, chunk-major) + nyquist gate + one-hot expander
    data_specs += [
        pl.BlockSpec((1, f1 * kc, hg), lambda i, j, s: (i, chunk_idx(s), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f1 * kc, hg), lambda i, j, s: (i, chunk_idx(s), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, hg), lambda i, j, s: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, dblk), lambda i, j, s: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [g_r, g_i, g_nyq, jnp.asarray(blk)]

    for name in ("w2r", "w2i"):
        arr = cst[name]                               # (f2, f2) resident
        data_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, s: (0, 0), memory_space=pltpu.VMEM))
        args.append(jnp.asarray(arr))
    for name in ("wibr", "wibi", "twfr", "twfi", "twir", "twii"):
        arr = cst[name]                               # (nk, ., .)
        data_specs.append(pl.BlockSpec(
            (1,) + arr.shape[1:],
            lambda i, j, s: (chunk_idx(s), 0, 0),
            memory_space=pltpu.VMEM))
        args.append(jnp.asarray(arr))
    for name in ("s1r", "s1i", "is1r", "is1i"):
        arr = cst[name]                               # (f1, f1) resident
        data_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, s: (0, 0), memory_space=pltpu.VMEM))
        args.append(jnp.asarray(arr))
    for name in ("afr", "afi", "bfr", "bfi", "air", "aii", "cir", "cii",
                 "dc"):
        arr = cst[name]                               # (n2, 1) permuted
        data_specs.append(pl.BlockSpec(
            (f1 * kc, 1), lambda i, j, s: (chunk_idx(s), 0),
            memory_space=pltpu.VMEM))
        args.append(jnp.asarray(arr))

    scratch = [
        pltpu.VMEM((f2, f1 * 2 * dblk), jnp.float32),
        pltpu.VMEM((f2, f1 * 2 * dblk), jnp.float32),
        pltpu.VMEM((n2, 2 * dblk), jnp.float32),
        pltpu.VMEM((8, dblk), jnp.float32),
    ]

    kwargs = {"scratch_shapes": scratch}
    if not interpret:
        from fft_tpu.kernels.pallas_causal import _VMEM_LIMIT
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT)
    y = pl.pallas_call(
        kernel,
        grid=(b, nj, nsteps),
        out_shape=jax.ShapeDtypeStruct((b, nj, n, dblk), v.dtype),
        in_specs=data_specs,
        out_specs=pl.BlockSpec((1, 1, n, dblk),
                               lambda i, j, s: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(*args)
    return jnp.transpose(y, (0, 2, 1, 3)).reshape(b, n, d)

