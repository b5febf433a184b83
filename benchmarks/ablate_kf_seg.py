"""A/B the segment-rFFT Pallas kernel (kf part B) vs the matfft rfft_2C
pipeline on chip, at the long-context shapes the fused kf kernel can't
reach (n_fft 16k/32k) plus the 2048 shape it declines.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/ablate_kf_seg.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import fft_tpu.kernels.pallas_causal as pc
from fft_tpu.kernels.matfft import rfft_matmul


def slope(fn, *args, k_lo=6, k_hi=72):
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
    # (seq==n_fft, chunk, batch, lanes): 350M @16k is (16384, 2048, 1, 512);
    # hybrid @32k is (32768, 2048, 1, 1024); 2048 is the kf-kernel-declined
    # layer shape from the sweep.
    for n, chunk, b, L in [(2048, 512, 16, 128), (8192, 2048, 4, 128),
                           (16384, 2048, 1, 512), (32768, 2048, 1, 1024)]:
        nc = n // chunk
        if L % 128 or not pc.kf_seg_rfft_supported(n, chunk):
            print(json.dumps({"n": n, "skip": True}), flush=True)
            continue
        rng = np.random.default_rng(0)
        kt = jnp.asarray(rng.standard_normal((b, n, L)), jnp.float32)

        def kern(kt, c):
            kr, ki = pc.kf_seg_rfft(kt + (c * 1e-20).astype(kt.dtype),
                                    chunk, True, False)
            return kr.sum()[None]

        def mat(kt, c):
            k_seg = (kt + (c * 1e-20).astype(kt.dtype)).reshape(
                b, nc, chunk, L)
            kf = rfft_matmul(k_seg, 2 * chunk, axis=-2, precision=prec)
            return jnp.real(kf).sum()[None]

        t_k = slope(kern, kt)
        t_m = slope(mat, kt)
        print(json.dumps({"n": n, "chunk": chunk, "batch": b, "lanes": L,
                          "kernel_ms": round(t_k * 1e3, 3),
                          "matfft_ms": round(t_m * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
