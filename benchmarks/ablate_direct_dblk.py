"""Ablation: direct-matrix mix kernel program granularity.

Times _direct_mix_call at dblk 128/256/512 (the flagship B=8, N=1024,
d=512 bf16 shape) plus a batch-flattened variant that reshapes
(B, N, D) -> (1, N, B*D) outside the kernel so each program's matmuls
get B x wider columns (the gate is pre-expanded per column, so the
kernel math is identical).  Slope-timed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ablate_direct_dblk.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.kernels.pallas_fft import _direct_mix_call

N = 1024
B = 8
D = 512


def slope_time(jitfn, v, g_r, g_i, k_lo=8, k_hi=72, reps=5):
    def chain(v, k):
        def body(h, _):
            out = jitfn(h, g_r, g_i)
            return (h + 1e-6 * out).astype(v.dtype), None
        h, _ = jax.lax.scan(body, v, None, length=k)
        return h.reshape(-1)[0].astype(jnp.float32)

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


def main():
    f_half = N // 2 + 1
    hg = 32                                            # heads*groups
    key = jax.random.key(0)
    v = jax.random.normal(key, (B, N, D), jnp.bfloat16)
    g_r = jax.random.normal(jax.random.key(1), (B, f_half, hg), jnp.float32)
    g_i = jax.random.normal(jax.random.key(2), (B, f_half, hg), jnp.float32)

    for dblk in (128, 256, 512):
        fn = lambda v, gr, gi, dblk=dblk: _direct_mix_call(
            v, gr, gi, None, n_fft=N, fast=True, dblk=dblk)
        ms = slope_time(fn, v, g_r, g_i)
        print(json.dumps({"variant": f"dblk={dblk}", "ms": round(ms, 4)}),
              flush=True)

    # Batch-flattened: one "batch" row of B*D columns; gate columns are
    # expanded so column j*D+c uses batch j's gate (hg*B one-hot columns).
    vf = jnp.moveaxis(v, 0, 1).reshape(1, N, B * D)
    grf = jnp.concatenate([g_r[j] for j in range(B)], axis=-1)[None]
    gif = jnp.concatenate([g_i[j] for j in range(B)], axis=-1)[None]
    for dblk in (512, 1024, 2048, 4096):
        fn = lambda v, gr, gi, dblk=dblk: _direct_mix_call(
            v, gr, gi, None, n_fft=N, fast=True, dblk=dblk)
        ms = slope_time(fn, vf, grf, gif)
        print(json.dumps({"variant": f"flat dblk={dblk}",
                          "ms": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
