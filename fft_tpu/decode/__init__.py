"""Streaming decode: batched multi-head prefix-FFT cache + O(F) decode step."""

from fft_tpu.decode.cache import (
    PrefixFFTCache, cache_init, cache_prefill, cache_decode_step,
    spectre_multihead_decode_step, spectre_block_prefill,
    spectre_block_decode_step,
)

__all__ = [
    "PrefixFFTCache", "cache_init", "cache_prefill", "cache_decode_step",
    "spectre_multihead_decode_step", "spectre_block_prefill",
    "spectre_block_decode_step",
]
