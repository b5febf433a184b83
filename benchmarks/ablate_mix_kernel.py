"""Ablation: where does the fused-mix kernel's time go on the chip?

Times stripped-down variants with identical BlockSpecs/grid (N=1024, B=8,
d=512, bf16 I/O, fast mode).  Stages build up cumulatively:
  copy   — read v, write v (pipeline + HBM floor)
  pack   — + the even/odd packing reshapes and hermitian untangle arithmetic
  mm1    — + ONE (f1, f1) @ (f1, f2*2dblk) stage-1 matmul
  fwd    — + full forward DFT (2 mm, twiddle, mm3 pair)
  gate   — + gate-multiply-shaped elementwise block
  inv    — + the lane-stacked inverse DFT (4 mm, twiddle, mm3)
  full   — the production kernel shape
Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/ablate_mix_kernel.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import fft_tpu.kernels.pallas_fft as pf

N = 1024
B = 8
D = 512
DBLK = 128


def slope_time(jitfn, v, k_lo=8, k_hi=40, reps=5):
    def chain(v, k):
        def body(h, _):
            out = jitfn(h)
            return (h + 1e-6 * out).astype(v.dtype), None
        h, _ = jax.lax.scan(body, v, None, length=k)
        return h[0, 0, 0].astype(jnp.float32)

    f_lo = jax.jit(lambda v: chain(v, k_lo))
    f_hi = jax.jit(lambda v: chain(v, k_hi))
    float(np.asarray(f_lo(v)))
    float(np.asarray(f_hi(v)))

    def timed(f):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(v)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo) * 1e3


def make_variant(stage: str):
    cst = pf._consts(N)
    n2, f1, f2 = cst["n2"], cst["f1"], cst["f2"]
    prec = jax.lax.Precision.DEFAULT
    names = ["w1r", "w1i", "twr", "twi", "w2r", "w2i",
             "i1r", "i1i", "itwr", "itwi", "i2r", "i2i",
             "afr", "afi", "bfr", "bfi", "air", "aii",
             "cir", "cii", "dc"]

    def kernel(v_ref, *refs):
        o_ref = refs[-1]
        (w1r, w1i, twr, twi, w2r, w2i,
         i1r, i1i, itwr, itwi, i2r, i2i,
         afr, afi, bfr, bfi, air, aii, cir, cii, dc) = (
            r[:] for r in refs[:-1])
        v = v_ref[0].astype(jnp.float32)

        if stage == "copy":
            o_ref[0] = (v * 1.0000001).astype(o_ref.dtype)
            return

        def mm(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=prec)

        def mm3(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32,
                                       precision=prec)

        def out_pack(a, bb):
            o_ref[0] = jnp.stack([a, bb], 1).reshape(N, DBLK).astype(
                o_ref.dtype)

        zs = v.reshape(n2, 2 * DBLK)

        if stage == "pack":
            fsr = zs * 1.01
            fsi = zs * 0.99
        elif stage == "mm1":
            xr2 = zs.reshape(f1, f2 * 2 * DBLK)
            yr = mm(w1r, xr2)
            fsr = yr.reshape(n2, 2 * DBLK)
            fsi = fsr * 0.5
        else:

            def dft(xr, xi, a_r, a_i, t_r, t_i, b_r, b_i):
                d_ = xr.shape[-1]
                xr2 = xr.reshape(f1, f2 * d_)
                if xi is None:
                    yr = mm(a_r, xr2)
                    yi = mm(a_i, xr2)
                else:
                    xi2 = xi.reshape(f1, f2 * d_)
                    yr = mm(a_r, xr2) - mm(a_i, xi2)
                    yi = mm(a_r, xi2) + mm(a_i, xr2)
                if f2 == 1:
                    return yr.reshape(n2, d_), yi.reshape(n2, d_)
                yr = yr.reshape(f1, f2, d_)
                yi = yi.reshape(f1, f2, d_)
                ur = yr * t_r[:, :, None] - yi * t_i[:, :, None]
                ui = yr * t_i[:, :, None] + yi * t_r[:, :, None]
                vr = mm3(b_r, ur) - mm3(b_i, ui)
                vi = mm3(b_r, ui) + mm3(b_i, ur)
                return vr.reshape(n2, d_), vi.reshape(n2, d_)

            fsr, fsi = dft(zs, None, w1r, w1i, twr, twi, w2r, w2i)

        frr, fir = fsr[:, :DBLK], fsr[:, DBLK:]
        fri, fii = fsi[:, :DBLK], fsi[:, DBLK:]
        pr = frr - fii
        pi = fri + fir
        zcr = frr + fii
        zci = fri - fir
        xr = afr * pr - afi * pi + bfr * zcr - bfi * zci
        xi = afr * pi + afi * pr + bfr * zci + bfi * zcr
        if stage in ("pack", "mm1", "fwd"):
            out_pack(xr, xi)
            return

        g_r = xr * 1.01
        g_i = xi * 0.99
        mr = g_r * xr - g_i * xi
        mi = (g_r * xi + g_i * xr) * (1.0 - dc)
        m_nyq = jnp.sum(mr[:1], axis=0, keepdims=True)
        if stage == "gate":
            out_pack(mr, mi)
            return

        amr = air * mr - aii * mi
        ami = air * mi + aii * mr
        cmr = cir * mr + cii * mi
        cmi = cii * mr - cir * mi
        sr = jnp.concatenate([amr, cmr], axis=-1)
        si = jnp.concatenate([ami, -cmi], axis=-1)
        tr, ti = dft(sr, si, i1r, i1i, itwr, itwi, i2r, i2i)
        z_r = tr[:, :DBLK] + tr[:, DBLK:] + 0.001 * m_nyq
        z_i = ti[:, :DBLK] - ti[:, DBLK:] + 0.001 * m_nyq
        out_pack(z_r, z_i)

    grid = (B, D // DBLK)
    specs = [pl.BlockSpec((1, N, DBLK), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)]
    consts = []
    for name in names:
        arr = np.asarray(cst[name], np.float32)
        specs.append(pl.BlockSpec(arr.shape,
                                  lambda i, j, nd=arr.ndim: (0,) * nd,
                                  memory_space=pltpu.VMEM))
        consts.append(jnp.asarray(arr))

    @jax.jit
    def run(v):
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((B, N, D), v.dtype),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, N, DBLK), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(v, *consts)

    return run


def main():
    v = jax.random.normal(jax.random.key(1), (B, N, D), jnp.bfloat16)
    for stage in ("copy", "pack", "mm1", "fwd", "gate", "inv"):
        ms = slope_time(make_variant(stage if stage != "inv" else "full"), v)
        print(json.dumps({"stage": stage, "ms": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
