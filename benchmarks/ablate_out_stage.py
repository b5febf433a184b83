"""A/B the fused causal kernel's output stage (dense partial-irFFT matrices
vs staged inverse via the delay identity) and channel-block width on chip.

Usage: PYTHONPATH=.:... python benchmarks/ablate_out_stage.py [seq chunk]
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import fft_tpu.kernels.pallas_causal as pc

D = 512
COLS = 32           # heads * groups


def slope(fn, *args, k_lo=3, k_hi=12):
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


def main():
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    batch = max(1, 32768 // seq)
    nc = seq // chunk
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((batch, seq, D)), jnp.bfloat16)
    kfr = jnp.asarray(rng.standard_normal((batch, nc, chunk + 1, nc * COLS)),
                      jnp.float32)
    kfi = jnp.asarray(rng.standard_normal((batch, nc, chunk + 1, nc * COLS)),
                      jnp.float32)

    results = {}
    for staged in (False, True):
        for dblk in (128, 256):
            key = f"{'staged' if staged else 'dense'}_{dblk}"
            if not pc._fused_vmem_ok(nc, chunk, dblk, 2, False, staged):
                results[key] = None
                continue
            try:
                def mix(v, kr, ki, c):
                    y = pc._fused_causal_call(
                        v + (c * 1e-20).astype(v.dtype), kr, ki,
                        chunk=chunk, cols=COLS, fast=True,
                        interpret=False, staged=staged, dblk=dblk,
                        scr_bf16=False)
                    return y.astype(jnp.float32).sum()[None]
                t = slope(mix, v, kfr, kfi)
                results[key] = round(t * 1e3, 3)
            except Exception as e:
                results[key] = f"FAIL {type(e).__name__}"
            print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps({"seq": seq, "chunk": chunk, **results}), flush=True)


if __name__ == "__main__":
    main()
