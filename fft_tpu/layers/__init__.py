"""SPECTRE layer library: pure init/apply functions over parameter pytrees."""

from fft_tpu.layers.spectre import (
    spectre_head_init, spectre_head_apply,
    spectre_multihead_init, spectre_multihead_apply,
    spectre_block_init, spectre_block_apply,
    wavelet_refinement_apply,
)

__all__ = [
    "spectre_head_init", "spectre_head_apply",
    "spectre_multihead_init", "spectre_multihead_apply",
    "spectre_block_init", "spectre_block_apply",
    "wavelet_refinement_apply",
]
