"""Profiling helpers: jax.profiler traces + a roofline estimator for the
spectral-mix layer (the north-star metric is %-of-HBM-roofline)."""

from __future__ import annotations

import contextlib
import dataclasses


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture an XProf/TensorBoard trace of the enclosed computation."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class MixCost:
    """Analytic cost model of one spectral-mix layer application."""
    flops: float          # real FLOPs
    hbm_bytes: float      # minimal HBM traffic (read x once, write y once)

    def roofline_ms(self, hbm_gbps: float = 819.0,
                    flops_tps: float = 197e12) -> float:
        """Lower-bound ms on one chip (defaults: TPU v5e — 819 GB/s HBM,
        197 bf16 TFLOPs)."""
        t_mem = self.hbm_bytes / (hbm_gbps * 1e9)
        t_flop = self.flops / flops_tps
        return max(t_mem, t_flop) * 1e3


def spectral_mix_cost(batch: int, n_fft: int, d: int,
                      radix_sum: int = 64, bytes_per_el: int = 4) -> MixCost:
    """FFT-as-matmul cost: ~8 * n * sum(radices) real flops per (batch, d)
    vector per direction, plus the pointwise gate; minimal HBM = read v +
    write y (everything else resident)."""
    vectors = batch * d
    fft_flops = 2 * 8 * n_fft * radix_sum * vectors   # fwd + inverse
    gate_flops = 6 * (n_fft // 2 + 1) * vectors       # complex multiply
    hbm = 2 * batch * n_fft * d * bytes_per_el
    return MixCost(flops=float(fft_flops + gate_flops), hbm_bytes=float(hbm))


def direct_mix_cost(batch: int, n_fft: int, d: int, hg: int = 32,
                    bytes_per_el: int = 4) -> MixCost:
    """Cost of the direct-matrix kernel AS IMPLEMENTED
    (kernels/pallas_fft.py::_direct_mix_call): forward (2F, N) @ (N, d),
    gate expand (F, HG) @ (HG, d) x2, inverse (N, 2F) @ (2F, d) — dense
    folded-constant matmuls, so its compute bound is MXU peak over these
    flops (an O(N log N) FFT does less arithmetic but loses on VPU
    passes; see RESULTS.md).  HBM = read v + gate, write y."""
    f = n_fft // 2 + 1
    mm_flops = batch * (2 * (2 * f) * n_fft * d      # fwd stacked DFT
                        + 2 * n_fft * (2 * f) * d    # inverse
                        + 2 * 2 * f * hg * d)        # gate expand (r, i)
    gate_flops = 6 * f * batch * d                   # complex multiply (VPU)
    hbm = (2 * batch * n_fft * d * bytes_per_el      # v in, y out
           + 2 * batch * f * hg * 4)                 # compact gate (f32)
    return MixCost(flops=float(mm_flops + gate_flops), hbm_bytes=float(hbm))


@dataclasses.dataclass(frozen=True)
class ChipConstants:
    """Measured (not nominal) peaks of the chip running this process."""
    hbm_gbps: float
    mxu_tflops_bf16: float
    mxu_tflops_f32: float


def measure_chip_constants(trials: int = 3) -> ChipConstants:
    """Measure achievable HBM bandwidth (big streaming add) and MXU peak
    (square matmuls, bf16 and f32 inputs) on the current default device,
    slope-timed so relay/dispatch walls cancel.  These replace the
    hardcoded v5e constants (819 GB/s / 197 TFLOPs) as roofline
    denominators — per VERDICT r2 weak-item 5, the north-star metric
    deserves per-measured-chip constants."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    def slope(fn, x, k_lo=4, k_hi=20):
        def chain(x, k):
            def body(h, _):
                return fn(h), None
            h, _ = jax.lax.scan(body, x, None, length=k)
            return h.ravel()[0].astype(jnp.float32)
        f_lo = jax.jit(lambda x: chain(x, k_lo))
        f_hi = jax.jit(lambda x: chain(x, k_hi))
        float(np.asarray(f_lo(x)))
        float(np.asarray(f_hi(x)))

        def timed(f):
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                float(np.asarray(f(x)))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(f_hi) - timed(f_lo)) / (k_hi - k_lo)

    # HBM: y = x + 1 over 256 MB (read + write = 512 MB per step)
    nel = 64 * 1024 * 1024
    x = jnp.zeros((nel,), jnp.float32)
    t = slope(lambda h: h + 1.0, x)
    hbm_gbps = 2 * nel * 4 / t / 1e9

    def mxu(dtype):
        m = 4096
        a = jnp.ones((m, m), dtype)
        t = slope(lambda h: (h @ a).astype(dtype), a)
        return 2 * m**3 / t / 1e12

    return ChipConstants(hbm_gbps=hbm_gbps,
                         mxu_tflops_bf16=mxu(jnp.bfloat16),
                         mxu_tflops_f32=mxu(jnp.float32))
