"""Static configuration dataclasses.

Mirrors the reference constructor surface exactly (reference:
/root/reference/spectre.py:404-416 ``SpectreHead.__init__``,
:664-676 ``SpectreMultiHead.__init__``, :911-925 ``SpectreBlock.__init__``)
so reference configs map 1:1.  All fields are static (hashable) — instances
are passed as static arguments to jitted functions.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SpectreHeadConfig:
    """One frequency-domain token-mixer head (reference spectre.py:400-474).

    Attributes mirror the reference constructor kwargs; derived sizes follow
    the reference arithmetic exactly (F_half = n_fft//2+1, buckets
    B = max(4, num_buckets or floor(sqrt(F_half))) — spectre.py:425-426).
    """

    embed_dim: int                     # per-head dim (`d` in the reference)
    n_fft: int
    num_groups: int = 4
    num_buckets: Optional[int] = None
    d_gate: int = 256
    use_toeplitz: bool = False
    toeplitz_bw: int = 4
    dropout_p: float = 0.0
    pooling_type: str = "dct"          # "dct" | "attention" | "mean"
    # --- framework extensions (not in the reference) ---
    # "reference" reproduces the reference's decode descriptor sum_q/N even
    # when the window holds fewer than N tokens (spectre.py:578, SURVEY
    # §3.6-C2); "consistent" divides by the true token count.
    decode_descriptor: str = "reference"
    fft_impl: str = "auto"             # "auto" | "jnp" | "matmul" | "pallas"
    # Mixed precision: GEMMs/activations run in this dtype (bfloat16 for
    # MXU speed); FFTs, layernorm statistics, and the complex gate math stay
    # fp32.  Parity target at bfloat16 is <=1e-2 (BASELINE.md).
    compute_dtype: str = "float32"     # "float32" | "bfloat16"
    # Reproduce the reference cubic path's real/imag scrambling across gate
    # groups (spectre.py:42 reshape bug, see ops/interp.py) for parity.
    interp_reference_compat: bool = False

    def __post_init__(self):
        assert self.embed_dim % self.num_groups == 0, (
            "embed_dim must be divisible by num_groups")
        assert self.pooling_type in ("dct", "attention", "mean")

    @property
    def f_half(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def buckets(self) -> int:
        return max(4, self.num_buckets or int(math.sqrt(self.f_half)))

    @property
    def d_group(self) -> int:
        return self.embed_dim // self.num_groups


@dataclasses.dataclass(frozen=True)
class SpectreConfig:
    """Multi-head SPECTRE mixer + block config (spectre.py:664-698, 911-965).

    ``memory_size`` semantics follow the reference (spectre.py:946-949):
    0 = no spectral memory; 1 = full-F_half frozen complex memory;
    >1 = that many frequency bins (zero-padded to F_half in forward).
    """

    embed_dim: int
    num_heads: int
    n_fft: int
    mlp_ratio: int = 4
    d_gate: int = 256
    use_toeplitz: bool = False
    toeplitz_bw: int = 4
    dropout_p: float = 0.0
    pooling_type: str = "dct"
    num_groups: int = 4
    num_buckets: Optional[int] = None
    wavelet_on_rate: float = 0.1
    memory_size: int = 0
    # --- framework extensions ---
    decode_descriptor: str = "reference"
    fft_impl: str = "auto"
    compute_dtype: str = "float32"
    interp_reference_compat: bool = False
    # Reference wavelet arithmetic is not a perfect-reconstruction pair
    # (SURVEY §3.6-D); default uses our PR Haar pyramid, compat flag
    # reproduces the reference filter arithmetic for parity tests.
    wavelet_reference_compat: bool = False
    # Causal spectral gating via chunked prefix-FFT (framework addition for
    # long-context causal LMs; the reference forward is non-causal).
    causal: bool = False
    causal_chunk: int = 128
    # "segmented": overlap-save block convolution (default — faster and
    # shard-local, the sequence-parallel causal algorithm; see
    # layers/causal_seg).  "fft2n": per-chunk linear conv via 2N-point FFTs
    # (also used automatically when the sequence doesn't divide into
    # chunks).
    causal_impl: str = "segmented"

    def __post_init__(self):
        assert self.embed_dim % self.num_heads == 0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def f_half(self) -> int:
        return self.n_fft // 2 + 1

    def head_config(self) -> SpectreHeadConfig:
        return SpectreHeadConfig(
            embed_dim=self.head_dim,
            n_fft=self.n_fft,
            num_groups=self.num_groups,
            num_buckets=self.num_buckets,
            d_gate=self.d_gate,
            use_toeplitz=self.use_toeplitz,
            toeplitz_bw=self.toeplitz_bw,
            dropout_p=self.dropout_p,
            pooling_type=self.pooling_type,
            decode_descriptor=self.decode_descriptor,
            fft_impl=self.fft_impl,
            compute_dtype=self.compute_dtype,
            interp_reference_compat=self.interp_reference_compat,
        )

    @property
    def memory_freq_bins(self) -> int:
        """Stored memory bins (spectre.py:949)."""
        if self.memory_size <= 0:
            return 0
        if self.memory_size == 1:
            return self.f_half
        return min(self.memory_size, self.f_half)
