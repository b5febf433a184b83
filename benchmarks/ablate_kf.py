"""A/B the kf-spectra Pallas kernel vs the matfft pipeline on chip.

Usage: PYTHONPATH=.:... python benchmarks/ablate_kf.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import fft_tpu.kernels.pallas_causal as pc
from fft_tpu.kernels.matfft import irfft_matmul, rfft_matmul


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
    prec = jax.lax.Precision.DEFAULT
    # (seq==n_fft, chunk, batch): the sweep shapes whose lanes are %128
    for n_fft, chunk, b in [(1024, 128, 32), (2048, 512, 16),
                            (4096, 1024, 8), (8192, 2048, 4)]:
        nc = n_fft // chunk
        L = nc * 32
        if L % 128 or not pc.kf_spectra_supported(n_fft, chunk):
            print(json.dumps({"n_fft": n_fft, "skip": True}), flush=True)
            continue
        rng = np.random.default_rng(0)
        f = n_fft // 2 + 1
        gr = jnp.asarray(rng.standard_normal((b, f, L)), jnp.float32)
        gi = jnp.asarray(rng.standard_normal((b, f, L)), jnp.float32)

        def kern(gr, gi, c):
            kr, ki = pc.kf_spectra(gr + (c * 1e-20).astype(gr.dtype), gi,
                                   n_fft, chunk, True, False)
            return kr.sum()[None]

        def mat(gr, gi, c):
            g = jax.lax.complex(gr + (c * 1e-20).astype(gr.dtype), gi)
            k_time = irfft_matmul(g, n_fft, axis=-2, precision=prec)
            k_seg = k_time.reshape(b, nc, chunk, L)
            kf = rfft_matmul(k_seg, 2 * chunk, axis=-2, precision=prec)
            return jnp.real(kf).sum()[None]

        t_k = slope(kern, gr, gi)
        t_m = slope(mat, gr, gi)
        print(json.dumps({"n_fft": n_fft, "chunk": chunk, "batch": b,
                          "lanes": L, "kernel_ms": round(t_k * 1e3, 3),
                          "matfft_ms": round(t_m * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
