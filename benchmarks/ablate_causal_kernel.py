"""Ablation: where does the v2 fused-causal kernel's time go on chip?

Variants (cumulative unless noted):
  dma    — load v + K blocks, write zeros (pipeline + HBM floor)
  fft    — + the nc segment rFFTs into scratch (delta==0 stage)
  banded — + the per-c delta accumulation loop
  full   — + the final partial-irFFT matmuls (production kernel)
Usage: PYTHONPATH=.:... python benchmarks/ablate_causal_kernel.py
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import fft_tpu.kernels.pallas_fft as pf
import fft_tpu.kernels.pallas_causal as pc

B, NC, CHUNK, D, COLS = 4, 16, 512, 512, 32
N = NC * CHUNK
DBLK = 256


def make(stage):
    cst = pf._consts(2 * CHUNK)
    n2, f1, f2d = cst["n2"], cst["f1"], cst["f2"]
    f2p = pc._pad8(n2 + 1)
    prec = jax.lax.Precision.DEFAULT
    dblk = DBLK

    def kernel(v_ref, kr_ref, ki_ref, e_ref, ar_ref, ai_ref,
               w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref, w2i_ref,
               afr_ref, afi_ref, bfr_ref, bfi_ref,
               o_ref, vr_scr, vi_scr, accr, acci):
        delta = pl.program_id(2)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        if stage == "dma":
            # touch v + K blocks, minimal math
            t = (v_ref[0, pl.ds(0, 8)].astype(jnp.float32)
                 + jnp.sum(kr_ref[0, 0, 0, :8, :], axis=-1, keepdims=True)
                 + jnp.sum(ki_ref[0, 0, 0, :8, :], axis=-1, keepdims=True))

            @pl.when(delta == NC - 1)
            def _():
                o_ref[0, pl.ds(0, 8)] = t.astype(o_ref.dtype)
            return

        @pl.when(delta == 0)
        def _():
            zero = jnp.zeros((2 * NC * f2p, dblk), jnp.float32)
            vr_scr[:] = zero
            vi_scr[:] = zero
            accr[:] = jnp.zeros((NC * f2p, dblk), jnp.float32)
            acci[:] = jnp.zeros((NC * f2p, dblk), jnp.float32)
            w1r, w1i = w1r_ref[:], w1i_ref[:]
            twr, twi = twr_ref[:], twi_ref[:]
            w2r, w2i = w2r_ref[:], w2i_ref[:]
            afr, afi = afr_ref[:], afi_ref[:]
            bfr, bfi = bfr_ref[:], bfi_ref[:]

            def seg_body(s, carry):
                seg = v_ref[0, pl.ds(s * CHUNK, 2 * CHUNK)].astype(
                    jnp.float32)
                zs = seg.reshape(n2, 2 * dblk)
                fsr, fsi = pf.staged_dft(zs, None, w1r, w1i, twr, twi,
                                         w2r, w2i, f1, f2d, prec)
                frr, fir = fsr[:, :dblk], fsr[:, dblk:]
                fri, fii = fsi[:, :dblk], fsi[:, dblk:]
                xr = afr * (frr - fii) - afi * (fri + fir) + \
                    bfr * (frr + fii) - bfi * (fri - fir)
                xi = afr * (fri + fir) + afi * (frr - fii) + \
                    bfr * (fri - fir) + bfi * (frr + fii)
                x_nyq = jnp.sum(zs[:, :dblk] - zs[:, dblk:], axis=0,
                                keepdims=True)
                base = (NC + s) * f2p
                vr_scr[pl.ds(base, n2)] = xr
                vi_scr[pl.ds(base, n2)] = xi
                vr_scr[pl.ds(base + n2, 1)] = x_nyq
                return carry

            jax.lax.fori_loop(0, NC, seg_body, 0)

        if stage != "fft":
            e = e_ref[0]

            def delta_body(c, carry):
                gr = mm(kr_ref[0, pl.ds(c, 1), 0][0], e)
                gi = mm(ki_ref[0, pl.ds(c, 1), 0][0], e)
                voff = (NC + c - delta) * f2p
                vr = vr_scr[pl.ds(voff, f2p)]
                vi = vi_scr[pl.ds(voff, f2p)]
                aoff = c * f2p
                accr[pl.ds(aoff, f2p)] = accr[pl.ds(aoff, f2p)] + (
                    gr * vr - gi * vi)
                acci[pl.ds(aoff, f2p)] = acci[pl.ds(aoff, f2p)] + (
                    gr * vi + gi * vr)
                return carry

            jax.lax.fori_loop(delta, NC, delta_body, 0)

        @pl.when(delta == NC - 1)
        def _():
            if stage == "full":
                ar = ar_ref[:]
                ai = ai_ref[:]

                def out_body(c, carry):
                    y = (mm(ar, accr[pl.ds(c * f2p, f2p)])
                         + mm(ai, acci[pl.ds(c * f2p, f2p)]))
                    o_ref[0, pl.ds(c * CHUNK, CHUNK)] = y.astype(o_ref.dtype)
                    return carry

                jax.lax.fori_loop(0, NC, out_body, 0)
            else:
                o_ref[0, pl.ds(0, 8)] = (
                    vr_scr[pl.ds(0, 8)] + accr[pl.ds(0, 8)]).astype(
                        o_ref.dtype)

    return kernel, f2p, cst


def run_variant(stage):
    kernel, f2p, cst = make(stage)
    n2 = cst["n2"]
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    kfr = jnp.asarray(rng.standard_normal((B, NC, NC, f2p, COLS)),
                      jnp.float32)
    kfi = jnp.asarray(rng.standard_normal((B, NC, NC, f2p, COLS)),
                      jnp.float32)
    ar, ai = pc._inv_rows_np(CHUNK)
    ar_p = np.zeros((CHUNK, f2p), np.float32)
    ai_p = np.zeros((CHUNK, f2p), np.float32)
    ar_p[:, :n2 + 1] = ar
    ai_p[:, :n2 + 1] = ai
    d_per_col = D // COLS
    e = np.zeros((D // DBLK, COLS, DBLK), np.float32)
    for j in range(D // DBLK):
        for l in range(DBLK):
            e[j, (j * DBLK + l) // d_per_col, l] = 1.0
    const_specs, const_args = [], []
    for name in ("w1r", "w1i", "twr", "twi", "w2r", "w2i",
                 "afr", "afi", "bfr", "bfi"):
        arr = np.asarray(cst[name], np.float32)
        const_specs.append(pl.BlockSpec(
            arr.shape, lambda i, j, dl, nd=arr.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        const_args.append(jnp.asarray(arr))

    @jax.jit
    def run(v):
        v_pad = jnp.pad(v, ((0, 0), (CHUNK, 0), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=(B, D // DBLK, NC),
            out_shape=jax.ShapeDtypeStruct((B, N, D), v.dtype),
            in_specs=[
                pl.BlockSpec((1, N + CHUNK, DBLK),
                             lambda i, j, dl: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NC, 1, f2p, COLS),
                             lambda i, j, dl: (i, 0, dl, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NC, 1, f2p, COLS),
                             lambda i, j, dl: (i, 0, dl, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, COLS, DBLK), lambda i, j, dl: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, f2p), lambda i, j, dl: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, f2p), lambda i, j, dl: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + const_specs,
            out_specs=pl.BlockSpec((1, N, DBLK), lambda i, j, dl: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * NC * f2p, DBLK), jnp.float32),
                pltpu.VMEM((2 * NC * f2p, DBLK), jnp.float32),
                pltpu.VMEM((NC * f2p, DBLK), jnp.float32),
                pltpu.VMEM((NC * f2p, DBLK), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=pc._VMEM_LIMIT),
        )(v_pad, kfr, kfi, jnp.asarray(e), jnp.asarray(ar_p),
          jnp.asarray(ai_p), *const_args)

    def slope(k_lo=2, k_hi=8):
        def chain(x, k):
            def body(h, _):
                out = run(h)
                return (h + 1e-12 * out[0, 0, 0].astype(h.dtype)).astype(
                    h.dtype), None
            h, _ = jax.lax.scan(body, x, None, length=k)
            return h[0, 0, 0].astype(jnp.float32)
        f_lo = jax.jit(lambda x: chain(x, k_lo))
        f_hi = jax.jit(lambda x: chain(x, k_hi))
        float(np.asarray(f_lo(v)))
        float(np.asarray(f_hi(v)))

        def t(f):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(f(v)))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(f_hi) - t(f_lo)) / (k_hi - k_lo) * 1e3

    print(json.dumps({"stage": stage, "ms": round(slope(), 3)}), flush=True)


if __name__ == "__main__":
    for stage in ("dma", "fft", "banded", "full"):
        run_variant(stage)
