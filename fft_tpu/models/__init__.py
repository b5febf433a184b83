"""Model zoo built on SPECTRE blocks (BASELINE.json configs 2-5)."""

from fft_tpu.models.lm import LMConfig, lm_init, lm_apply, lm_generate

__all__ = ["LMConfig", "lm_init", "lm_apply", "lm_generate"]
