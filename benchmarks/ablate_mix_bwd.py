"""Ablation: fused direct-mix backward kernel vs the jax.vjp fallback.

Times grad-of-sum through `pallas_spectral_mix` (which routes the
backward through `_mix_bwd`: the fused `_direct_mix_bwd_call` kernel
when supported, else jax.vjp of the unfused matmul composition) at the
flagship shape, against the forced-unfused adjoint.  Slope-timed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ablate_mix_bwd.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.kernels import pallas_fft as pf

N = 1024
B = 8
D = 512
HG = 32


def slope_time(jitfn, v, gr, gi, k_lo=8, k_hi=72, reps=5):
    def chain(v, k):
        def body(h, _):
            vb, gbr, gbi = jitfn(h, gr, gi)
            return (h + 1e-6 * vb).astype(v.dtype), None
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
    v = jax.random.normal(jax.random.key(0), (B, N, D), jnp.bfloat16)
    gr = jax.random.normal(jax.random.key(1), (B, f_half, HG), jnp.float32)
    gi = jax.random.normal(jax.random.key(2), (B, f_half, HG), jnp.float32)

    for fast in (True, False):
        # fused adjoint kernel, called directly (vbar + gate cotangents)
        def fused(v_, gr_, gi_, fast=fast):
            return pf._direct_mix_bwd_call(
                v_, gr_, gi_, v_, n_fft=N, fast=fast)

        ms = slope_time(fused, v, gr, gi)
        print(json.dumps({"variant": f"fused bwd fast={fast}",
                          "ms": round(ms, 4)}), flush=True)

        # jax.vjp of the unfused matmul composition (the old bwd path)
        def unfused(v_, gr_, gi_, fast=fast):
            g = jax.lax.complex(gr_, gi_)
            _, vjp = jax.vjp(
                lambda a, b: pf._unfused_mix(a, b, None, N, fast), v_, g)
            vb, gb = vjp(v_)
            return vb.astype(v_.dtype), jnp.real(gb), jnp.imag(gb)

        ms = slope_time(jax.jit(unfused), v, gr, gi)
        print(json.dumps({"variant": f"unfused vjp fast={fast}",
                          "ms": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
