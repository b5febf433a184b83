"""Numerics core: pure functions on jnp arrays.

Every op here has a golden-parity test against the PyTorch reference
(/root/reference/spectre.py) in ``tests/``.
"""

from fft_tpu.ops.complex import modrelu
from fft_tpu.ops.interp import interp_complex_1d
from fft_tpu.ops.conv import complex_circular_conv1d
from fft_tpu.ops.dct import dct2
from fft_tpu.ops.pooling import mean_pool, attention_pool, dct_pool
from fft_tpu.ops.wavelet import (
    haar_dwt_level, haar_idwt_level, haar_decompose, haar_reconstruct,
)
from fft_tpu.ops.spectral import pruned_irfft_single, rfft_phasor

__all__ = [
    "modrelu", "interp_complex_1d", "complex_circular_conv1d", "dct2",
    "mean_pool", "attention_pool", "dct_pool",
    "haar_dwt_level", "haar_idwt_level", "haar_decompose", "haar_reconstruct",
    "pruned_irfft_single", "rfft_phasor",
]
