"""On-chip validation + timing for the v3 grid-banded fused causal kernel.

The v3 kernel moves (c, delta) onto the Pallas grid so VMEM holds only
single-chunk windows — unlocking the long-context shapes (nc=16 @ chunk
2048 = seq 32k, nc=32 = seq 64k, d=1024) the v2 resident layout rejects.

Reports (slope method — the axon relay hides per-dispatch latency):
  1. correctness: v3 vs the jnp pipeline at a small f32 shape, on chip
  2. v2 vs v3 at a shape both cover (nc=8, chunk=2048, d=1024, fast)
  3. v3 at the v3-only long-context shapes

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/ablate_v3_kernel.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import fft_tpu.kernels.pallas_causal as pc


def slope(fn, *args, k_lo=3, k_hi=24):
    def chain(k):
        def run(*a):
            def body(c, _):
                out = fn(*a, c)
                return out.astype(jnp.float32).reshape(-1)[0] * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c
        return jax.jit(run)

    f_lo, f_hi = chain(k_lo), chain(k_hi)
    float(np.asarray(f_lo(*args)))
    float(np.asarray(f_hi(*args)))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo)


def mk(rng, b, nc, chunk, d, cols, dtype):
    v = jnp.asarray(rng.standard_normal((b, nc * chunk, d)), dtype)
    kfr = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)) / nc, jnp.float32)
    kfi = jnp.asarray(
        rng.standard_normal((b, nc, chunk + 1, nc * cols)) / nc, jnp.float32)
    return v, kfr, kfi


def main():
    rng = np.random.default_rng(0)
    out = {}

    # 1. correctness on chip (f32, exact)
    b, nc, chunk, d, cols = 1, 4, 512, 256, 32
    v, kfr, kfi = mk(rng, b, nc, chunk, d, cols, jnp.float32)
    got = np.asarray(pc._fused_causal_call_v3(
        v, kfr, kfi, chunk=chunk, cols=cols, fast=False))
    ref = np.asarray(jax.jit(pc._fused_causal_ref,
                             static_argnums=(3, 4))(v, kfr, kfi, chunk,
                                                    cols))
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    out["v3_chip_rel_err"] = rel
    print("v3 on-chip rel err:", rel, flush=True)
    assert rel < 1e-5, rel

    # 2. v2 vs v3 where both cover (350M seq-16k shape)
    b, nc, chunk, d, cols = 1, 8, 2048, 1024, 64
    v, kfr, kfi = mk(rng, b, nc, chunk, d, cols, jnp.bfloat16)

    def run_v2(v, kfr, kfi, c):
        return pc._fused_causal_call(v + c * 1e-20, kfr, kfi, chunk=chunk,
                                     cols=cols, fast=True)

    def run_v3(v, kfr, kfi, c):
        return pc._fused_causal_call_v3(v + c * 1e-20, kfr, kfi,
                                        chunk=chunk, cols=cols, fast=True)

    t2 = slope(run_v2, v, kfr, kfi)
    t3 = slope(run_v3, v, kfr, kfi)
    out["v2_16k_ms"] = t2 * 1e3
    out["v3_16k_ms"] = t3 * 1e3
    print(f"nc=8 chunk=2048 d=1024 fast: v2 {t2*1e3:.2f} ms  "
          f"v3 {t3*1e3:.2f} ms", flush=True)

    # 3. v3-only long-context shapes, variants, and the v1 path they
    #    replace (segment-spectra rFFTs via matfft + banded_inverse)
    from fft_tpu.kernels.matfft import rfft_matmul

    def run_v1(v, kfr, kfi, c):
        b, n, d = v.shape
        nc = n // chunk
        f2 = chunk + 1
        vs = (v + c * 1e-20).astype(jnp.float32).reshape(b, nc, chunk, d)
        v_prev = jnp.pad(vs[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        seg = jnp.concatenate([v_prev, vs], axis=2)
        vf = rfft_matmul(seg, 2 * chunk, axis=-2,
                         precision=jax.lax.Precision.DEFAULT)
        kf = jnp.transpose(kfr.reshape(b, nc, f2, nc, cols),
                           (0, 3, 1, 2, 4))
        kfim = jnp.transpose(kfi.reshape(b, nc, f2, nc, cols),
                             (0, 3, 1, 2, 4))
        y = pc.banded_inverse(jnp.real(vf), jnp.imag(vf), kf, kfim,
                              chunk, True)
        return y.reshape(b, n, d)

    for nc, d, tag in ((16, 1024, "32k"), (32, 1024, "64k")):
        b, chunk, cols = 1, 2048, 64
        v, kfr, kfi = mk(rng, b, nc, chunk, d, cols, jnp.bfloat16)
        t = slope(run_v3, v, kfr, kfi, k_lo=3, k_hi=12)
        out[f"v3_{tag}_ms"] = t * 1e3
        print(f"nc={nc} chunk=2048 d={d} fast: v3 {t*1e3:.2f} ms",
              flush=True)

        def run_v3b(v, kfr, kfi, c):
            return pc._fused_causal_call_v3(
                v + c * 1e-20, kfr, kfi, chunk=chunk, cols=cols,
                fast=True, scr_bf16=True, staged=True, dblk=256)

        if pc._v3_vmem_ok(nc, chunk, 256, 2, True, True, cols):
            tb = slope(run_v3b, v, kfr, kfi, k_lo=3, k_hi=12)
            out[f"v3b256_{tag}_ms"] = tb * 1e3
            print(f"  v3 dblk=256+bf16scr: {tb*1e3:.2f} ms", flush=True)
        if pc.banded_supported(nc, chunk + 1):
            t1 = slope(run_v1, v, kfr, kfi, k_lo=3, k_hi=12)
            out[f"v1_{tag}_ms"] = t1 * 1e3
            print(f"  v1 path (spectra via HBM): {t1*1e3:.2f} ms",
                  flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
