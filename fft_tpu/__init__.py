"""fft_tpu — a TPU-native JAX framework providing the capabilities of SPECTRE
(the FFT-based drop-in replacement for self-attention; reference:
/root/reference/spectre.py, arXiv 2502.18394).

Layout
------
- ``fft_tpu.ops``      — numerics core: complex modReLU, cubic complex
  interpolation, complex circular conv, poolers, DCT, Haar pyramid,
  pruned single-position irFFT.  Pure functions on jnp arrays.
- ``fft_tpu.layers``   — SPECTRE head / multi-head / block as pure
  ``init``/``apply`` functions over parameter pytrees (heads vmapped,
  not Python-looped as in the reference).
- ``fft_tpu.kernels``  — MXU matmul-FFT and Pallas fused spectral-mix
  kernels.
- ``fft_tpu.decode``   — batched multi-head prefix-FFT decode cache
  (pytree state; the reference cache is batch-1 per-head).
- ``fft_tpu.models``   — LM / ViT / hybrid model zoo.
- ``fft_tpu.parallel`` — mesh + sharding rules, distributed four-step FFT.
- ``fft_tpu.train``    — optax training loop, orbax checkpointing, data.
"""

__version__ = "0.1.0"

from fft_tpu import ops  # noqa: F401
from fft_tpu.config import SpectreConfig, SpectreHeadConfig  # noqa: F401
from fft_tpu.layers import (  # noqa: F401
    spectre_block_apply, spectre_block_init,
    spectre_head_apply, spectre_head_init,
    spectre_multihead_apply, spectre_multihead_init,
)
