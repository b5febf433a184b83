"""Real-FFT entry points with pluggable implementation.

The reference leans on ATen/pocketfft ``torch.fft.rfft/irfft``
(spectre.py:506, 551, 777).  Here every FFT goes through one dispatcher so
the layer code is implementation-agnostic:

- ``jnp``    — XLA's FFT HLO (always available, autodiff-exact).
- ``matmul`` — our MXU-native mixed-radix matmul FFT (fft_tpu.kernels.matfft):
  DFT stages expressed as dense matmuls over radix-≤128 factors, which XLA
  tiles onto the systolic array; preferred on TPU for large batched
  transforms.
- ``pallas`` — selects the fused Pallas kernels at the LAYER level
  (fft_tpu.kernels.pallas_fft / pallas_causal); any standalone transform
  under this config resolves to ``auto`` (there is deliberately no
  standalone Pallas rFFT — an unfused Pallas transform would be strictly
  worse than the matmul FFT, which XLA already tiles onto the MXU).
- ``auto``   — pick per (impl availability, size) at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp

_IMPLS = ("auto", "jnp", "matmul", "pallas")


def _resolve(impl: str, n: int) -> str:
    assert impl in _IMPLS, impl
    if impl == "pallas":
        # "pallas" selects the FUSED mix/causal kernels, which the layers
        # dispatch to directly; a *standalone* transform under that config
        # (decode prefill, memory injection, the fft2n causal branch) runs
        # on the MXU matmul FFT — same numerics, no fused analogue needed.
        impl = "auto"
    if impl == "auto":
        # matmul-FFT requires n to factor into radices <= 128; power-of-two
        # sizes always qualify.  Small transforms stay on jnp.
        from fft_tpu.kernels.matfft import plan_factors
        if n >= 128 and plan_factors(n) is not None:
            return "matmul"
        return "jnp"
    return impl


def rfft(x: jnp.ndarray, n: int, axis: int = -2, impl: str = "auto",
         precision=None) -> jnp.ndarray:
    """rFFT of real ``x`` along ``axis``, zero-padded/truncated to length n.

    ``precision`` (matmul impl only): MXU pass policy for the DFT stages;
    None = fp32-accurate HIGHEST.  Layers pass
    ``matfft.precision_for(cfg.compute_dtype)`` so bf16 models run
    single-pass bf16 DFT matmuls.
    """
    impl = _resolve(impl, n)
    if impl == "matmul":
        from fft_tpu.kernels.matfft import _PRECISION, rfft_matmul
        return rfft_matmul(x, n, axis=axis,
                           precision=_PRECISION if precision is None
                           else precision)
    return jnp.fft.rfft(x.astype(jnp.float32), n=n, axis=axis)


def irfft(x: jnp.ndarray, n: int, axis: int = -2, impl: str = "auto",
          precision=None) -> jnp.ndarray:
    """Inverse rFFT to real length-n output along ``axis``."""
    impl = _resolve(impl, n)
    if impl == "matmul":
        from fft_tpu.kernels.matfft import _PRECISION, irfft_matmul
        return irfft_matmul(x, n, axis=axis,
                            precision=_PRECISION if precision is None
                            else precision)
    return jnp.fft.irfft(x, n=n, axis=axis)
