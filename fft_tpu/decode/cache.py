"""Sliding-window prefix-FFT decode cache (reference spectre.py:731-814).

TPU-first redesign of the reference's ``PrefixFFTCache``:

- **Batched and multi-head**: state is (B, H, ...) — the reference is
  batch-1, one head per cache object, with no model-level orchestration
  (SURVEY §3.3).  Here the whole model decodes one token per step under a
  single jit.
- **Pure pytree state**: a NamedTuple of arrays, updated functionally with
  ``dynamic_update_slice`` — checkpointable by construction (the reference
  cache is invisible to ``state_dict``, spectre.py:731-766).
- **No complex leaves**: the frequency state is a real [re; im] pair so the
  cache can cross jit/device boundaries on TPU runtimes where complex64
  transfer is unimplemented.
- **Stable phasors**: the insert phasor uses t mod N (mathematically equal
  to the reference's unbounded exp(j*omega*k*t), spectre.py:805, but immune
  to the float32 phase drift the reference accumulates by t ~ 1e5).
- The reference's dead positional phase multiply in decode
  (exp(j*2pi*k*(t-j)/N) == 1 identically, spectre.py:594-598, SURVEY
  §3.6-C1) is not replicated.

The per-step math is otherwise the reference's: evict the phasor of the
overwritten token, add the new token's phasor, ring-buffer Q/V, maintain the
windowed descriptor sum.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreConfig, SpectreHeadConfig
from fft_tpu.layers.common import (
    gelu_exact, layernorm_apply, linear_apply,
)
from fft_tpu.layers.spectre import spectre_gate
from fft_tpu.ops import pruned_irfft_single, rfft_phasor
from fft_tpu.ops import fftops


class PrefixFFTCache(NamedTuple):
    """Decode state for one SPECTRE layer (all heads, full batch)."""

    prefix_re: jnp.ndarray   # (B, H, F_half, hd) real part of window rFFT
    prefix_im: jnp.ndarray   # (B, H, F_half, hd)
    v_buf: jnp.ndarray       # (B, H, N, hd) ring buffer of values
    q_buf: jnp.ndarray       # (B, H, N, hd) ring buffer of queries
    sum_q: jnp.ndarray       # (B, H, hd) windowed query sum
    t: jnp.ndarray           # () int32, last filled position (-1 = empty)

    @property
    def n_fft(self) -> int:
        return self.v_buf.shape[-2]


def cache_init(batch: int, num_heads: int, n_fft: int, head_dim: int,
               dtype=jnp.float32) -> PrefixFFTCache:
    f_half = n_fft // 2 + 1
    shape = (batch, num_heads, n_fft, head_dim)
    return PrefixFFTCache(
        prefix_re=jnp.zeros((batch, num_heads, f_half, head_dim), dtype),
        prefix_im=jnp.zeros((batch, num_heads, f_half, head_dim), dtype),
        v_buf=jnp.zeros(shape, dtype),
        q_buf=jnp.zeros(shape, dtype),
        sum_q=jnp.zeros((batch, num_heads, head_dim), dtype),
        t=jnp.asarray(-1, jnp.int32),
    )


def cache_prefill(cache: PrefixFFTCache, q: jnp.ndarray, v: jnp.ndarray,
                  fft_impl: str = "auto") -> PrefixFFTCache:
    """Ingest a prompt: q, v are (B, H, L, hd) with L <= n_fft
    (spectre.py:769-783).  The prompt length L is static (pad the prompt to a
    bucket if needed)."""
    n = cache.n_fft
    length = q.shape[-2]
    assert length <= n, (length, n)
    v_fft = fftops.rfft(v, n, axis=-2, impl=fft_impl)     # zero-pads to n
    v_buf = cache.v_buf.at[..., :length, :].set(v)
    q_buf = cache.q_buf.at[..., :length, :].set(q)
    return cache._replace(
        prefix_re=jnp.real(v_fft),
        prefix_im=jnp.imag(v_fft),
        v_buf=v_buf,
        q_buf=q_buf,
        sum_q=jnp.sum(q, axis=-2),
        t=jnp.asarray(length - 1, jnp.int32),
    )


def cache_decode_step(
    cache: PrefixFFTCache, q_t: jnp.ndarray, v_t: jnp.ndarray,
    reference_compat: bool = False,
) -> PrefixFFTCache:
    """Append one token (q_t, v_t: (B, H, hd)) — rank-1 frequency update with
    eviction once the window wraps (spectre.py:786-814).  Fully jittable.

    ``reference_compat``: the reference reads ``q_old = Q_buf[j]`` as a VIEW
    and overwrites the buffer in place before using it (spectre.py:810-813),
    so its ``sum_q += q_t - q_old`` degenerates to ``+= 0`` once the window
    wraps — the gate descriptor freezes at the prefill sum forever (latent
    defect #5, found during golden decode parity).  Default is the intended
    sliding-window sum; compat mode reproduces the frozen-sum behavior."""
    n = cache.n_fft
    t = cache.t + 1
    j = jnp.mod(t, n)
    wrapped = t >= n

    v_old = jnp.take_along_axis(
        cache.v_buf, j[None, None, None, None], axis=-2)[..., 0, :]
    q_old = jnp.take_along_axis(
        cache.q_buf, j[None, None, None, None], axis=-2)[..., 0, :]

    # Evict the overwritten token's phasor; insert the new one.  The insert
    # phase exp(-2pi*i*k*t/n) == exp(-2pi*i*k*j/n) exactly (t = j mod n).
    ph = rfft_phasor(n, j)                                 # (F_half,) complex
    ph_re = jnp.real(ph)[:, None]
    ph_im = jnp.imag(ph)[:, None]

    evict = jnp.where(wrapped, 1.0, 0.0).astype(cache.prefix_re.dtype)
    delta = v_t[..., None, :] - evict * v_old[..., None, :]  # (B,H,1,hd)@F
    prefix_re = cache.prefix_re + ph_re * delta
    prefix_im = cache.prefix_im + ph_im * delta

    v_buf = jax.lax.dynamic_update_slice_in_dim(
        cache.v_buf, v_t[..., None, :], j, axis=-2)
    q_buf = jax.lax.dynamic_update_slice_in_dim(
        cache.q_buf, q_t[..., None, :], j, axis=-2)
    if reference_compat:
        sum_q = cache.sum_q + (1.0 - evict) * q_t
    else:
        sum_q = cache.sum_q + q_t - evict * q_old

    return cache._replace(prefix_re=prefix_re, prefix_im=prefix_im,
                          v_buf=v_buf, q_buf=q_buf, sum_q=sum_q, t=t)


# ---------------------------------------------------------------------------
# Layer-level decode (the reference only has per-head decode_step,
# spectre.py:562-611; multi-head/block orchestration is a framework addition)
# ---------------------------------------------------------------------------

def _decode_descriptor(params, cfg: SpectreHeadConfig, cache: PrefixFFTCache):
    """Streaming gate descriptor.

    - ``reference``: sum_q / N even for a partially-filled window
      (spectre.py:578, SURVEY §3.6-C2).
    - ``consistent``: divide by the true token count.
    - ``window``: run the head's CONFIGURED pooler (mean/attention/DCT) over
      the chronologically-ordered ring buffer — the streaming counterpart
      the reference lacks (its decode always mean-pools regardless of
      pooling_type).  Exactly matches forward once the window is full;
      costs O(N·d) per step instead of O(d).  Before the window fills,
      tokens sit at the FRONT (positions 0..t) with zeros padding the tail
      — the same layout the causal training gates pool over
      (layers/spectre.py:causal_chunk_gates), so chunk-1 causal training ==
      decode holds for every pooler.
    """
    if cfg.decode_descriptor == "window":
        from fft_tpu.layers.spectre import _pool_descriptor
        # pre-wrap the buffer is already [q_0..q_t, 0...]; post-wrap roll
        # the oldest token to the front
        shift = jnp.where(cache.t < cache.n_fft, 0,
                          -jnp.mod(cache.t + 1, cache.n_fft))
        q_seq = jnp.roll(cache.q_buf, shift, axis=-2)      # (B, H, N, hd)
        return jax.vmap(lambda hp, qs: _pool_descriptor(hp, cfg, qs),
                        in_axes=(0, 1), out_axes=1)(params, q_seq)
    if cfg.decode_descriptor == "consistent":
        count = jnp.minimum(cache.t + 1, cache.n_fft).astype(cache.sum_q.dtype)
    else:
        count = jnp.asarray(cache.n_fft, cache.sum_q.dtype)
    descr = cache.sum_q / count                            # (B, H, hd)
    return layernorm_apply(params["q_norm"], descr)


def spectre_multihead_decode_step(
    params,
    cfg: SpectreConfig,
    x_t: jnp.ndarray,                     # (B, d) current token (post-LN)
    cache: PrefixFFTCache,
    *,
    memory_fft: Optional[jnp.ndarray] = None,   # (F_half, d) complex
    reference_compat: bool = False,
) -> Tuple[jnp.ndarray, PrefixFFTCache]:
    """One decode step for all heads: project, update cache, gate, mix in
    frequency domain, pruned single-position irFFT, concat, out_proj.

    O(F * d) per token.  The wavelet refinement is a training-time stochastic
    residual and is off at decode (== deterministic eval at on_rate < 1).
    ``reference_compat`` reproduces the reference's Nyquist sign bug and its
    frozen sum_q descriptor for golden parity.

    Spectral memory: forward adds it UNGATED after the gate multiply
    (spectre.py:545-549), while the reference's documented decode recipe
    injects it into prefix_fft where it gets GATED (spectre.py:736-743) —
    another train/decode inconsistency.  We keep decode == forward: the
    newest token always sits at window position min(t, N-1), so its memory
    contribution is ``irfft(memory)[min(t, N-1)]`` — computed as a second
    O(F*d) pruned irFFT, keeping decode O(F*d) total.
    """
    b, d = x_t.shape
    h, hd = cfg.num_heads, cfg.head_dim
    hcfg = cfg.head_config()
    n = cache.n_fft

    xh = x_t.reshape(b, h, hd)
    # Per-head projections, vmapped over stacked head params.
    q_t = jnp.einsum("bhi,hio->bho", xh, params["heads"]["w_q"]["w"])
    v_t = jnp.einsum("bhi,hio->bho", xh, params["heads"]["w_v"]["w"])

    from fft_tpu.kernels import pallas_decode as pd
    use_fused = (pd.ENABLE and not reference_compat
                 and cfg.fft_impl in ("pallas", "auto")
                 and (pd.INTERPRET or jax.default_backend() != "cpu"))
    if use_fused:
        # Experimental fused path (opt-in, see kernels/pallas_decode.py:
        # XLA already fuses the jnp path below to near the bandwidth
        # floor, so this measured SLOWER on v5e and is off by default).
        t = cache.t + 1
        j = jnp.mod(t, n)
        wrapped = t >= n
        evict = jnp.where(wrapped, 1.0, 0.0).astype(cache.prefix_re.dtype)
        v_old = jnp.take_along_axis(
            cache.v_buf, j[None, None, None, None], axis=-2)[..., 0, :]
        q_old = jnp.take_along_axis(
            cache.q_buf, j[None, None, None, None], axis=-2)[..., 0, :]
        delta = (v_t - evict * v_old)[..., None, :]        # (B, H, 1, hd)
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            cache.v_buf, v_t[..., None, :], j, axis=-2)
        q_buf = jax.lax.dynamic_update_slice_in_dim(
            cache.q_buf, q_t[..., None, :], j, axis=-2)
        sum_q = cache.sum_q + q_t - evict * q_old
        cache = cache._replace(v_buf=v_buf, q_buf=q_buf, sum_q=sum_q, t=t)

        descr = _decode_descriptor(params["heads"], hcfg, cache)
        gate = jax.vmap(
            lambda hp, dh: spectre_gate(hp, hcfg, dh),
            in_axes=(0, 1), out_axes=1
        )(params["heads"], descr)                          # (B, H, G, F)
        gate_t = jnp.swapaxes(gate, -1, -2)                # (B, H, F, G)

        ph = rfft_phasor(n, j)                             # (F,) complex
        ph_r = jnp.real(ph)[None, :]
        ph_i = jnp.imag(ph)[None, :]
        pos = jnp.mod(t, n)
        f_half = n // 2 + 1
        k = jnp.arange(f_half, dtype=jnp.float32)
        phase = (2.0 * np.pi / n) * k * pos.astype(jnp.float32)
        coef = jnp.full((f_half,), 2.0).at[0].set(1.0).at[-1].set(1.0)
        w_r = (coef * jnp.cos(phase) / n)[None, :]
        w_i = (-coef * jnp.sin(phase) / n)[None, :]

        pre_r, pre_i, y_h = pd.fused_decode_mix(
            cache.prefix_re, cache.prefix_im,
            jnp.real(gate_t), jnp.imag(gate_t), delta,
            ph_r, ph_i, w_r, w_i, interpret=pd.INTERPRET)
        cache = cache._replace(prefix_re=pre_r, prefix_im=pre_i)
        y = y_h.reshape(b, d)
        if memory_fft is not None:
            pos_chron = jnp.minimum(cache.t, n - 1)
            y = y + pruned_irfft_single(memory_fft, n, pos_chron)
        return linear_apply(params["out_proj"], y), cache

    cache = cache_decode_step(cache, q_t, v_t,
                              reference_compat=reference_compat)

    descr = _decode_descriptor(params["heads"], hcfg, cache)  # (B, H, hd)
    # spectre_gate vmapped over heads (params stacked on axis 0).
    gate = jax.vmap(
        lambda hp, dh: spectre_gate(hp, hcfg, dh), in_axes=(0, 1), out_axes=1
    )(params["heads"], descr)                              # (B, H, G, F_half)

    gate_bc = jnp.repeat(jnp.swapaxes(gate, -1, -2), hcfg.d_group, axis=-1)
    prefix = jax.lax.complex(cache.prefix_re, cache.prefix_im)
    mixed = gate_bc * prefix                               # (B, H, F_half, hd)

    pos = jnp.mod(cache.t, n)
    v_out = pruned_irfft_single(mixed, n, pos,
                                reference_compat=reference_compat)
    y = v_out.reshape(b, d)
    if memory_fft is not None:
        pos_chron = jnp.minimum(cache.t, n - 1)   # window slot of newest tok
        y = y + pruned_irfft_single(memory_fft, n, pos_chron,
                                    reference_compat=reference_compat)
    return linear_apply(params["out_proj"], y), cache


def _block_memory_fft(params, cfg: SpectreConfig) -> Optional[jnp.ndarray]:
    """(F_half, d) complex spectral memory from the block's real-pair param,
    zero-padded if truncated (spectre.py:973-977)."""
    mem = params.get("memory_fft")
    if mem is None:
        return None
    bins = mem.shape[1]
    pad = cfg.f_half - bins
    if pad > 0:
        mem = jnp.pad(mem, ((0, 0), (0, pad), (0, 0)))
    return jax.lax.complex(mem[0], mem[1])


def spectre_block_prefill(
    params,
    cfg: SpectreConfig,
    x: jnp.ndarray,                       # (B, L, d) prompt
    cache: PrefixFFTCache,
    *,
    reference_compat: bool = False,
) -> PrefixFFTCache:
    """Prefill from a prompt through the block's LN + per-head projections.

    Spectral memory is handled at decode time (ungated, matching forward —
    see spectre_multihead_decode_step).  ``reference_compat=True`` instead
    reproduces the reference's documented recipe of adding the memory into
    prefix_fft after prefill (spectre.py:736-743), where the gate multiplies
    it — the reference's own decode/forward inconsistency."""
    b, length, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    x_ln = layernorm_apply(params["ln1"], x)
    xh = jnp.moveaxis(x_ln.reshape(b, length, h, hd), 2, 1)  # (B, H, L, hd)
    heads = params["mix"]["heads"]
    q = jnp.einsum("bhli,hio->bhlo", xh, heads["w_q"]["w"])
    v = jnp.einsum("bhli,hio->bhlo", xh, heads["w_v"]["w"])
    cache = cache_prefill(cache, q, v, fft_impl=cfg.fft_impl)

    if reference_compat:
        mem = _block_memory_fft(params, cfg)
        if mem is not None:
            mem_h = mem.reshape(cfg.f_half, h, hd)
            mem_h = jnp.moveaxis(mem_h, -2, 0)[None]       # (1, H, F, hd)
            cache = cache._replace(
                prefix_re=cache.prefix_re + jnp.real(mem_h),
                prefix_im=cache.prefix_im + jnp.imag(mem_h),
            )
    return cache


def spectre_block_decode_step(
    params,
    cfg: SpectreConfig,
    x_t: jnp.ndarray,                     # (B, d)
    cache: PrefixFFTCache,
    *,
    reference_compat: bool = False,
) -> Tuple[jnp.ndarray, PrefixFFTCache]:
    """Block-level single-token step: pre-LN residual mix + MLP
    (decode analogue of spectre_block_apply)."""
    h_ln = layernorm_apply(params["ln1"], x_t)
    memory_fft = None if reference_compat else _block_memory_fft(params, cfg)
    mix, cache = spectre_multihead_decode_step(
        params["mix"], cfg, h_ln, cache, memory_fft=memory_fft,
        reference_compat=reference_compat)
    x_t = x_t + mix
    h2 = layernorm_apply(params["ln2"], x_t)
    h2 = linear_apply(params["mlp"]["fc2"],
                      gelu_exact(linear_apply(params["mlp"]["fc1"], h2)))
    return x_t + h2, cache
