"""Variant matrix for the v2 fused causal kernel's segment-FFT stage.

Times _fused_causal_call with dense_fwd on/off across dblk at the seq-1k
and seq-4k margin shapes (VERDICT r3 item 1).  Inputs mirror the block's
producer layout (bf16 v, f32 kf in stage order); slope-timed.

Usage: PYTHONPATH=.:... python benchmarks/ablate_dense_fwd.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.kernels import pallas_causal as pc

D = 512
COLS = 32
TOKENS = 32768


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
    shapes = [(1024, 128), (1024, 256), (4096, 512), (4096, 1024),
              (2048, 512)]
    rng = np.random.default_rng(0)
    for seq, chunk in shapes:
        nc = seq // chunk
        batch = max(1, TOKENS // seq)
        v = jnp.asarray(rng.standard_normal((batch, seq, D)), jnp.bfloat16)
        kfr = jnp.asarray(rng.standard_normal(
            (batch, nc, chunk + 1, nc * COLS)), jnp.float32)
        kfi = jnp.asarray(rng.standard_normal(
            (batch, nc, chunk + 1, nc * COLS)), jnp.float32)
        for dense_fwd in (False, True):
            for dblk in (512, 256):
                if not pc._fused_vmem_ok(nc, chunk, dblk, 2, False, False,
                                         COLS, dense_fwd):
                    print(json.dumps({"seq": seq, "chunk": chunk,
                                      "dense_fwd": dense_fwd, "dblk": dblk,
                                      "skip": "vmem"}), flush=True)
                    continue

                def mix(vv, kr, ki, c, dblk=dblk, dense=dense_fwd):
                    y = pc._fused_causal_call(
                        vv + (c * 1e-20).astype(vv.dtype), kr, ki,
                        chunk=chunk, cols=COLS, fast=True, staged=False,
                        dblk=dblk, dense_fwd=dense)
                    return y.astype(jnp.float32).sum()[None]

                try:
                    t = slope(mix, v, kfr, kfi)
                except Exception as e:
                    print(json.dumps({"seq": seq, "chunk": chunk,
                                      "dense_fwd": dense_fwd, "dblk": dblk,
                                      "error": str(e)[:120]}), flush=True)
                    continue
                print(json.dumps({"seq": seq, "chunk": chunk, "nc": nc,
                                  "dense_fwd": dense_fwd, "dblk": dblk,
                                  "mix_ms": round(t * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
