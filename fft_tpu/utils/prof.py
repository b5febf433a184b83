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
