"""A/B the direct mix kernel vs its split-half-pipelined variant on chip.

Round-5 roofline re-measurement pinned the direct kernel at 72-77% of
the idealized MXU bound (fast bf16) with tight variance; the remaining
gap is the per-program serialization MXU(dm@v) -> VPU(gate) -> MXU(aa@m).
The split2 variant runs two independent half-dblk chains per program so
the Mosaic scheduler can overlap one half's VPU gate with the other
half's MXU pass.

Usage (chip): PYTHONPATH=.:/root/.axon_site PYTHONUNBUFFERED=1 \
    python benchmarks/ablate_direct_split2.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.kernels.pallas_fft import _direct_mix_call


def slope(fn, v, gr, gi, k_lo=8, k_hi=72, reps=3):
    def chain(v, gr, gi, k):
        def body(h, _):
            out = fn(h, gr, gi)
            return (h + 1e-12 * out).astype(v.dtype), None
        h, _ = jax.lax.scan(body, v, None, length=k)
        return h[0, 0, 0].astype(jnp.float32)

    f_lo = jax.jit(lambda v, gr, gi: chain(v, gr, gi, k_lo))
    f_hi = jax.jit(lambda v, gr, gi: chain(v, gr, gi, k_hi))
    float(np.asarray(f_lo(v, gr, gi)))
    float(np.asarray(f_hi(v, gr, gi)))

    def timed(f):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(v, gr, gi)))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo) * 1e3


def main():
    d, hg = 512, 32
    for n in (1024, 2048):
        b = 8192 // n
        rng = np.random.default_rng(0)
        v = jax.random.normal(jax.random.key(1), (b, n, d), jnp.bfloat16)
        gr = jnp.asarray(rng.standard_normal((b, n // 2 + 1, hg)),
                         jnp.float32)
        gi = jnp.asarray(rng.standard_normal((b, n // 2 + 1, hg)),
                         jnp.float32)
        for s2 in (False, True):
            for trial in range(3):
                ms = slope(lambda h, gr, gi, n=n, s2=s2: _direct_mix_call(
                    h, gr, gi, None, n_fft=n, fast=True, split2=s2),
                    v, gr, gi)
                print(json.dumps({"n": n, "split2": s2, "trial": trial,
                                  "ms": round(float(ms), 4)}), flush=True)


if __name__ == "__main__":
    main()
