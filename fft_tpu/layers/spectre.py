"""SPECTRE layers: frequency-domain token mixing (reference spectre.py:400-982).

Pure ``init``/``apply`` functions over parameter pytrees.  Differences from
the reference that are deliberate TPU-first design (not behavior changes):

- Heads are **vmapped** over stacked per-head parameters instead of the
  reference's sequential Python loop (spectre.py:712-713).
- The wavelet branch is computed batched with a mask instead of a Python
  loop over the batch (spectre.py:853-874).
- Randomness (dropout, wavelet on-mask) comes from explicit JAX PRNG keys;
  ``deterministic=True`` disables both (the reference is stochastic even in
  eval — SURVEY §3.6-E).
- The frozen spectral memory (spectre.py:951-959) is wrapped in
  ``stop_gradient`` at use; optimizers should additionally mask it out.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from fft_tpu.config import SpectreConfig, SpectreHeadConfig
from fft_tpu.layers.common import (
    gelu_exact, layernorm_apply, layernorm_init, linear_apply, linear_init,
)
from fft_tpu.ops import (
    attention_pool, complex_circular_conv1d, dct_pool, haar_decompose,
    haar_reconstruct, interp_complex_1d, mean_pool, modrelu,
)
from fft_tpu.ops.interp import interp_complex_1d_ref_compat
from fft_tpu.ops import fftops


# ---------------------------------------------------------------------------
# Single head (spectre.py:400-557)
# ---------------------------------------------------------------------------

def spectre_head_init(key, cfg: SpectreHeadConfig, dtype=jnp.float32):
    d = cfg.embed_dim
    keys = jax.random.split(key, 6)
    params = {
        "w_q": linear_init(keys[0], d, d, bias=False, dtype=dtype),
        "w_v": linear_init(keys[1], d, d, bias=False, dtype=dtype),
        "gate_mlp": {
            "fc1": linear_init(keys[2], d, cfg.d_gate, dtype=dtype),
            "fc2": linear_init(keys[3], cfg.d_gate,
                               cfg.buckets * cfg.num_groups * 2, dtype=dtype),
        },
        "q_norm": layernorm_init(d, dtype),
        # Reference flattens the (G, F_half) gate before modReLU
        # (spectre.py:531), so the bias is per (group, frequency) element.
        # Init -0.1 = near-identity gate (spectre.py:105).
        "modrelu_bias": jnp.full((cfg.num_groups, cfg.f_half), -0.1, dtype),
    }
    if cfg.pooling_type == "attention":
        k1, k2 = jax.random.split(keys[4])
        params["pool"] = {
            "fc1": linear_init(k1, d, 256, dtype=dtype),
            "fc2": linear_init(k2, 256, 1, dtype=dtype),
        }
    if cfg.use_toeplitz:
        # The intended init of the reference's (crashing) constructor
        # (spectre.py:464-474): complex kernel, length 2*bw+1, 1/sqrt(len).
        # Stored as a real (2, klen) [re; im] pair: complex leaves must never
        # cross a jit/device boundary on TPU (transfer of complex64 is
        # unimplemented on some TPU runtimes; real pairs also checkpoint
        # cleanly).  Recombined with lax.complex inside the traced fn.
        klen = 2 * cfg.toeplitz_bw + 1
        kr = jax.random.split(keys[5], 1)[0]
        scale = 1.0 / math.sqrt(2.0 * klen)  # per-component std of cfloat randn
        params["toeplitz_kernel"] = (
            jax.random.normal(kr, (2, klen), dtype) * scale)
    return params


def spectre_gate(params, cfg: SpectreHeadConfig, descriptor: jnp.ndarray):
    """Content-adaptive complex spectral gate from a pooled descriptor.

    descriptor: (..., d) normalized pooled query.  Returns (..., G, F_half)
    complex gate — the shared math of forward (spectre.py:515-531) and
    decode (spectre.py:579-591).
    """
    h = gelu_exact(linear_apply(params["gate_mlp"]["fc1"], descriptor))
    raw = linear_apply(params["gate_mlp"]["fc2"], h).astype(jnp.float32)
    raw = raw.reshape(*raw.shape[:-1], cfg.num_groups, cfg.buckets, 2)
    anchor = jax.lax.complex(raw[..., 0], raw[..., 1])       # (..., G, Bk)
    if cfg.use_toeplitz:
        tk = params["toeplitz_kernel"]
        anchor = anchor + complex_circular_conv1d(
            anchor, jax.lax.complex(tk[0], tk[1]))
    if cfg.interp_reference_compat:
        gate = interp_complex_1d_ref_compat(anchor, cfg.f_half)
    else:
        gate = interp_complex_1d(anchor, cfg.f_half, mode="cubic")
    return modrelu(gate, params["modrelu_bias"])


def _pool_descriptor(params, cfg: SpectreHeadConfig, q: jnp.ndarray):
    if cfg.pooling_type == "attention":
        pooled = attention_pool(
            {"w1": params["pool"]["fc1"]["w"], "b1": params["pool"]["fc1"]["b"],
             "w2": params["pool"]["fc2"]["w"], "b2": params["pool"]["fc2"]["b"]},
            q)
    elif cfg.pooling_type == "dct":
        pooled = dct_pool(q)
    else:
        pooled = mean_pool(q)
    return layernorm_apply(params["q_norm"], pooled)


def causal_chunk_gates(params, cfg: SpectreHeadConfig, q: jnp.ndarray,
                       n_chunks: int, causal_chunk: int) -> jnp.ndarray:
    """Per-chunk gates from causal cumulative descriptors: the configured
    pooler (mean / dct / attention) over tokens up to and including the
    chunk's FIRST position, zero-padded to the n_fft window — exactly the
    decode-side streaming descriptor at that step (``sum_q/N`` for mean,
    the ``decode_descriptor="window"`` pooler for dct/attention), so
    causal_chunk=1 reproduces decode bit-for-bit.

    All three poolers reduce to chunk-cumulative prefix sums (a
    full-sequence cumsum lowers to a slow sequential scan on TPU):
    - mean: prefix sum of q, divided by n_fft as decode does.
    - dct: dct_pool is LINEAR — prefix sum of q weighted by the mean of
      the first-K DCT-II basis rows (ops/dct.py:dct_pool_weights).
    - attention: softmax over the zero-padded window splits into a prefix
      sum of exp(score)*q (zero-pad slots contribute zero vectors to the
      numerator) and a denominator of prefix-summed exp(score) plus
      (n_fft - tokens) * exp(score(0)) for the padding slots.

    Returns (B, nc, G, F_half) complex."""
    b, n, d = q.shape
    pad_n = n_chunks * causal_chunk
    starts = jnp.arange(n_chunks) * causal_chunk

    def pad(x):
        return (jnp.pad(x, ((0, 0), (0, pad_n - n), (0, 0)))
                if pad_n > n else x)

    def chunk_cum(x):
        """Inclusive-of-first-token chunk prefix: sum over tokens
        [0, c*chunk] for each chunk c.  x: (B, pad_n, c) -> (B, nc, c)."""
        sums = jnp.sum(x.reshape(b, n_chunks, causal_chunk, -1), axis=2)
        excl = jnp.cumsum(sums, axis=1) - sums
        return excl + jnp.take(x, starts, axis=-2)

    if cfg.pooling_type == "dct":
        from fft_tpu.ops.dct import dct_pool_weights
        wbar = dct_pool_weights(cfg.n_fft)[:n].astype(q.dtype)
        descr = chunk_cum(pad(q * wbar[:, None]))
    elif cfg.pooling_type == "attention":
        p = params["pool"]
        s = linear_apply(p["fc2"],
                         gelu_exact(linear_apply(p["fc1"], q)))  # (B, n, 1)
        zero_tok = jnp.zeros((d,), q.dtype)
        s0 = linear_apply(p["fc2"],
                          gelu_exact(linear_apply(p["fc1"], zero_tok)))[0]
        m = jnp.maximum(jnp.max(s, axis=(-2, -1), keepdims=True), s0)
        es = jnp.exp(s - m)
        numer = chunk_cum(pad(q * es))                       # (B, nc, d)
        denom = chunk_cum(pad(es))                           # (B, nc, 1)
        n_pad_slots = (cfg.n_fft - (starts + 1)).astype(q.dtype)
        denom = denom + n_pad_slots[None, :, None] * jnp.exp(s0 - m)
        descr = numer / denom
    else:
        descr = chunk_cum(pad(q)) / cfg.n_fft
    descr = layernorm_apply(params["q_norm"], descr)
    return spectre_gate(params, cfg, descr)                  # (B, nc, G, F)


def spectre_head_apply_causal(
    params,
    cfg: SpectreHeadConfig,
    x: jnp.ndarray,                      # (B, N, d) tokens of one head
    *,
    causal_chunk: int = 128,
    causal_impl: str = "fft2n",
    memory_fft: Optional[jnp.ndarray] = None,   # (F_half, d) complex
    dropout_rng=None,
    deterministic: bool = True,
):
    """Causal ("prefix") spectral gating — a framework addition: the
    reference forward is non-causal (global FFT over the window; only its
    decode path is incremental — SURVEY §2.4).

    Construction:
    - The gate descriptor for chunk c pools STRICTLY-PAST tokens (cumulative
      mean up to the previous chunk boundary), so no future leak.
    - The mixing kernel k_c = irfft(gate_c) is applied as a **linear** (not
      circular) convolution over the past via a 2N-point FFT; taps cover the
      last n_fft tokens exactly like the decode window.  At causal_chunk=1
      this is bit-identical to the decode path's math; larger chunks trade a
      <=chunk-token descriptor lag for fewer gate computations.
    - Spectral memory adds irfft(memory)[p] in time, matching both the
      non-causal forward and decode (for p < n_fft).

    Requires N <= n_fft.  All three poolers are supported as streaming
    (chunk-cumulative) descriptors — see causal_chunk_gates; dct/attention
    match decode_descriptor="window" on the decode side.  The wavelet
    branch is non-causal and must be off in causal models.
    """
    b, n, d = x.shape
    assert n <= cfg.n_fft, f"sequence {n} exceeds n_fft {cfg.n_fft}"
    causal_chunk = min(causal_chunk, n)
    n_chunks = -(-n // causal_chunk)

    q = linear_apply(params["w_q"], x)
    v = linear_apply(params["w_v"], x)
    gate = causal_chunk_gates(params, cfg, q, n_chunks, causal_chunk)

    if causal_impl == "segmented" and n % causal_chunk == 0:
        # overlap-save block convolution: identical math, shard-local FFTs
        # (the sequence-parallel causal algorithm — see layers/causal_seg).
        from fft_tpu.layers.causal_seg import segmented_causal_mix
        y = segmented_causal_mix(v, gate, cfg, causal_chunk)
    else:
        # per-chunk linear convolution via 2N-point FFTs
        n2 = 2 * cfg.n_fft
        from fft_tpu.kernels.matfft import precision_for
        prec = precision_for(cfg.compute_dtype)
        k_time = fftops.irfft(gate, cfg.n_fft, axis=-1, impl=cfg.fft_impl,
                              precision=prec)
        gate2 = fftops.rfft(k_time, n2, axis=-1, impl=cfg.fft_impl,
                            precision=prec)
        gate2 = jnp.repeat(jnp.moveaxis(gate2, -2, -1)[..., None],
                           cfg.d_group, axis=-1)             # (B,nc,F2,1*d_g)
        gate2 = gate2.reshape(b, n_chunks, n2 // 2 + 1, d)

        vf = fftops.rfft(v, n2, axis=-2, impl=cfg.fft_impl,
                         precision=prec)                     # (B, F2, d)

        def chunk_out(c):
            y = fftops.irfft(gate2[:, c] * vf, n2, axis=-2,
                             impl=cfg.fft_impl, precision=prec)
            return jax.lax.dynamic_slice_in_dim(
                y, c * causal_chunk, causal_chunk, axis=-2)

        y = jax.lax.map(chunk_out, jnp.arange(n_chunks))     # (nc, B, C, d)
        y = jnp.moveaxis(y, 0, 1).reshape(
            b, n_chunks * causal_chunk, d)[:, :n]

    if memory_fft is not None:
        mem_time = fftops.irfft(memory_fft[None], cfg.n_fft, axis=-2,
                                impl=cfg.fft_impl)[0]
        y = y + mem_time[:n]

    y = y.astype(x.dtype)
    q_pool = layernorm_apply(params["q_norm"],
                             jnp.sum(q, axis=-2) / cfg.n_fft)
    if not deterministic and cfg.dropout_p > 0.0:
        keep = 1.0 - cfg.dropout_p
        mask = jax.random.bernoulli(dropout_rng, keep, y.shape)
        y = jnp.where(mask, y / keep, 0.0)
    return y, q_pool


def spectre_head_apply(
    params,
    cfg: SpectreHeadConfig,
    x: jnp.ndarray,                      # (B, N, d) tokens of one head
    *,
    pos_phase: Optional[jnp.ndarray] = None,
    memory_fft: Optional[jnp.ndarray] = None,   # (F_half, d) complex
    dropout_rng=None,
    deterministic: bool = True,
    sp_mesh=None,                        # Mesh with a 'seq' axis -> SP mix
    sp_layout: str = "contiguous",
):
    """Full-sequence forward (spectre.py:479-557).  Requires N <= n_fft.
    Returns (mixed (B, N, d), q_pool (B, d)).

    With ``sp_mesh`` the FFT->gate->iFFT runs as the distributed four-step
    over the mesh's 'seq' axis (requires N == n_fft); everything else
    (projections, pooling) is GSPMD-sharded automatically.

    ``sp_layout="strided"``: x is in the strided sequence layout
    (parallel.dist_fft.sp_stride_permute) and the mix runs the optimal
    2-all-to-all path.  Projections/LN/residuals are position-pointwise and
    mean/attention pooling are order-invariant, so whole blocks chain in
    this layout with no extra collectives (DCT pooling is order-sensitive
    and rejected)."""
    n = x.shape[-2]
    assert n <= cfg.n_fft, f"sequence {n} exceeds n_fft {cfg.n_fft}"

    q = linear_apply(params["w_q"], x)
    v = linear_apply(params["w_v"], x)

    q_pool = _pool_descriptor(params, cfg, q)                 # (B, d)
    gate = spectre_gate(params, cfg, q_pool)                  # (B, G, F_half)

    if pos_phase is not None:
        if pos_phase.ndim == 2:                               # (B, F_half)
            gate = gate * pos_phase[:, None, :]
        else:                                                 # (F_half,)
            gate = gate * pos_phase
    # (B, G, F) -> (B, F, G) -> repeat groups over channels -> (B, F, d).
    gate_bc = jnp.repeat(jnp.swapaxes(gate, -1, -2), cfg.d_group, axis=-1)

    if sp_mesh is not None:
        if sp_layout == "strided":
            from fft_tpu.parallel.dist_fft import sp_spectral_mix_strided
            if cfg.pooling_type not in ("mean", "attention"):
                # Trace-time (not a bare assert: survives python -O).  The
                # strided layout hands each shard one residue class of the
                # sequence; DCT pooling reads positions in order.
                raise ValueError(
                    f"pooling_type={cfg.pooling_type!r} is order-sensitive; "
                    "the strided SP layout needs an order-invariant pooler "
                    "(mean or attention) — use sp_layout='contiguous'")
            out = sp_spectral_mix_strided(v, gate_bc, memory_fft,
                                          n_fft=cfg.n_fft, mesh=sp_mesh)
        else:
            from fft_tpu.parallel.dist_fft import sp_spectral_mix
            out = sp_spectral_mix(v, gate_bc, memory_fft,
                                  n_fft=cfg.n_fft, mesh=sp_mesh)
    else:
        from fft_tpu.kernels.matfft import precision_for
        prec = precision_for(cfg.compute_dtype)
        v_fft = fftops.rfft(v, cfg.n_fft, axis=-2, impl=cfg.fft_impl,
                            precision=prec)
        mixed = gate_bc * v_fft
        if memory_fft is not None:
            mixed = mixed + memory_fft
        v_time = fftops.irfft(mixed, cfg.n_fft, axis=-2, impl=cfg.fft_impl,
                              precision=prec)
        out = v_time[..., :n, :]
    out = out.astype(x.dtype)

    if not deterministic and cfg.dropout_p > 0.0:
        keep = 1.0 - cfg.dropout_p
        mask = jax.random.bernoulli(dropout_rng, keep, out.shape)
        out = jnp.where(mask, out / keep, 0.0)
    return out, q_pool


# ---------------------------------------------------------------------------
# Wavelet refinement (spectre.py:819-887)
# ---------------------------------------------------------------------------

def wavelet_refinement_init(key, embed_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, embed_dim, embed_dim, dtype=dtype),
        "fc2": linear_init(k2, embed_dim, embed_dim, dtype=dtype),
    }


def wavelet_refinement_apply(
    params,
    v: jnp.ndarray,                      # (B, N, d) mixed tokens
    q_pool: jnp.ndarray,                 # (B, d) pooled descriptor
    on_rate: float,
    *,
    rng=None,
    deterministic: bool = True,
    reference_compat: bool = False,
):
    """Gated straight-through wavelet residual.

    The gate MLP (Linear-SiLU-Linear-Sigmoid) trains; the wavelet path is
    ``stop_gradient``-ed (the reference's design choice, spectre.py:876-885).
    Batched mask instead of the reference's per-row Python loop.  With the
    default PR Haar pyramid the decompose->reconstruct roundtrip is exact for
    ANY length (the reference crashes on odd-length pyramid levels and is
    lossy elsewhere — SURVEY §3.6-D); ``reference_compat=True`` reproduces
    the reference's filter arithmetic for parity tests.

    Determinism: the reference samples the on-mask even in eval.  Here,
    ``deterministic=True`` rounds the behavior: on_rate >= 1 -> always on,
    otherwise off.  Training passes an explicit ``rng``.
    """
    if on_rate <= 0.0:
        return v
    h = jax.nn.silu(linear_apply(params["fc1"], q_pool))
    gate = jax.nn.sigmoid(linear_apply(params["fc2"], h))[:, None, :]  # (B,1,d)

    vt = jnp.swapaxes(v, -1, -2)                             # (B, d, N)
    coeffs, lengths = haar_decompose(vt, reference_compat=reference_compat)
    v_ref = jnp.swapaxes(haar_reconstruct(coeffs, lengths), -1, -2)

    if on_rate >= 1.0:
        mask = jnp.ones((v.shape[0], 1, 1), v.dtype)
    elif deterministic:
        return v
    else:
        mask = jax.random.bernoulli(
            rng, on_rate, (v.shape[0], 1, 1)).astype(v.dtype)

    return v + jax.lax.stop_gradient(v_ref) * gate * mask


# ---------------------------------------------------------------------------
# Multi-head wrapper (spectre.py:660-726)
# ---------------------------------------------------------------------------

def spectre_multihead_init(key, cfg: SpectreConfig, dtype=jnp.float32):
    hcfg = cfg.head_config()
    kh, ko, kw = jax.random.split(key, 3)
    head_keys = jax.random.split(kh, cfg.num_heads)
    heads = jax.vmap(lambda k: spectre_head_init(k, hcfg, dtype))(head_keys)
    return {
        "heads": heads,                                        # stacked over H
        "out_proj": linear_init(ko, cfg.embed_dim, cfg.embed_dim,
                                bias=False, dtype=dtype),
        "wavelet": wavelet_refinement_init(kw, cfg.embed_dim, dtype),
    }


def spectre_multihead_apply(
    params,
    cfg: SpectreConfig,
    x: jnp.ndarray,                      # (B, N, d)
    *,
    pos_phase: Optional[jnp.ndarray] = None,
    memory_fft: Optional[jnp.ndarray] = None,   # (F_half, d) complex
    rngs: Optional[dict] = None,
    deterministic: bool = True,
    sp_mesh=None,
    sp_layout: str = "contiguous",
):
    b, n, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    hcfg = cfg.head_config()

    xh = jnp.moveaxis(x.reshape(b, n, h, hd), 2, 0)          # (H, B, N, hd)

    # Fused Pallas path: heads' mixes are pointwise per channel, so ALL
    # heads concat into ONE d-wide fused rFFT->gate->irFFT kernel call.
    # Unsupported (n_fft, d) combinations fall through to the matmul-FFT
    # composition below — same math, unfused.
    use_fused = cfg.fft_impl == "pallas" and not cfg.causal and sp_mesh is None
    use_wide = False
    if use_fused:
        from fft_tpu.kernels import pallas_fft as pf
        from fft_tpu.kernels.matfft import plan_factors
        # fall back on CPU unless the interpreter is on (tests): a real
        # pallas_call has no CPU lowering, and fft_impl="pallas" promises
        # never to dead-end (tests/test_fftimpl_pallas.py)
        use_fused = (pf.pallas_mix_supported(cfg.n_fft) and d % 128 == 0
                     and (jax.default_backend() != "cpu" or pf.INTERPRET))
        # past the fused kernels' reach, STILL run all heads as ONE
        # d-wide matmul-FFT composition (the per-head fallback transforms
        # hd=64-wide arrays — half the lane axis idle — and traces H
        # separate graphs); _unfused_mix additionally dispatches the
        # split-real bf16 variant in fast mode at these sizes
        use_wide = (not use_fused and cfg.n_fft >= 16384 and d % 128 == 0
                    and plan_factors(cfg.n_fft) is not None)
    if use_fused or use_wide:
        from fft_tpu.kernels.pallas_fft import _unfused_mix, spectral_mix

        def gates_and_v(hp, xi):
            q = linear_apply(hp["w_q"], xi)
            v = linear_apply(hp["w_v"], xi)
            q_pool = _pool_descriptor(hp, hcfg, q)
            gate = spectre_gate(hp, hcfg, q_pool)            # (B, G, F)
            if pos_phase is not None:
                gate = gate * (pos_phase[:, None, :]
                               if pos_phase.ndim == 2 else pos_phase)
            return v, gate, q_pool

        vh, gate, q_pools = jax.vmap(gates_and_v)(params["heads"], xh)
        v_all = jnp.moveaxis(vh, 0, 2).reshape(b, n, d)
        # compact gate: one column per (head, group) — the kernel expands
        # to channels in-VMEM (16x less gate HBM traffic than broadcasting)
        gate_bc = jnp.transpose(gate, (1, 3, 0, 2)).reshape(
            b, cfg.f_half, cfg.num_heads * cfg.num_groups)
        if n < cfg.n_fft:
            v_all = jnp.pad(v_all, ((0, 0), (0, cfg.n_fft - n), (0, 0)))
        if use_fused:
            mixed = spectral_mix(v_all, gate_bc, memory_fft, cfg.n_fft,
                                 cfg.compute_dtype == "bfloat16")
        else:
            mixed = _unfused_mix(v_all, gate_bc, memory_fft, cfg.n_fft,
                                 fast=cfg.compute_dtype == "bfloat16")
        mixed = mixed[:, :n].astype(x.dtype)
        if not deterministic and cfg.dropout_p > 0.0:
            keep = 1.0 - cfg.dropout_p
            mask = jax.random.bernoulli(rngs["dropout"], keep, mixed.shape)
            mixed = jnp.where(mask, mixed / keep, 0.0)
        q_pool = jnp.moveaxis(q_pools, 0, 1).reshape(b, d)
        refined = wavelet_refinement_apply(
            params["wavelet"], mixed, q_pool, cfg.wavelet_on_rate,
            rng=None if rngs is None else rngs.get("wavelet"),
            deterministic=deterministic,
            reference_compat=cfg.wavelet_reference_compat,
        )
        return linear_apply(params["out_proj"], refined)

    in_axes = [0, 0]
    args = [params["heads"], xh]
    if memory_fft is not None:
        memh = jnp.moveaxis(memory_fft.reshape(cfg.f_half, h, hd), 1, 0)
        args.append(memh)
        in_axes.append(0)
    else:
        args.append(None)
        in_axes.append(None)
    if not deterministic and cfg.dropout_p > 0.0:
        args.append(jax.random.split(rngs["dropout"], h))
        in_axes.append(0)
    else:
        args.append(None)
        in_axes.append(None)

    if cfg.causal:
        assert cfg.wavelet_on_rate == 0.0, (
            "the wavelet branch is non-causal; set wavelet_on_rate=0 for "
            "causal models")

        chunk = min(cfg.causal_chunk, n)
        if cfg.causal_impl == "segmented" and n % chunk == 0:
            # Multihead fast path: heads' mixes are channel-pointwise, so
            # ALL heads run as ONE full-d-width segmented convolution
            # (per-head arrays leave half the 128-lane axis empty at
            # hd=64; this path also fuses 1 graph instead of H).
            from fft_tpu.layers.causal_seg import segmented_causal_mix
            nc = n // chunk

            def gates_and_qv(hp, xi):
                q = linear_apply(hp["w_q"], xi)
                vv = linear_apply(hp["w_v"], xi)
                g = causal_chunk_gates(hp, hcfg, q, nc, chunk)
                q_pool = layernorm_apply(
                    hp["q_norm"], jnp.sum(q, axis=-2) / cfg.n_fft)
                return vv, g, q_pool

            vh, gate, q_pools = jax.vmap(gates_and_qv)(params["heads"], xh)
            v_all = jnp.moveaxis(vh, 0, 2).reshape(b, n, d)
            # gate columns h-major then group => channel c // d_g == h*G+g
            gate_all = jnp.transpose(gate, (1, 2, 0, 3, 4)).reshape(
                b, nc, cfg.num_heads * cfg.num_groups, cfg.f_half)
            mixed = segmented_causal_mix(v_all, gate_all, hcfg, chunk)
            if memory_fft is not None:
                mem_time = fftops.irfft(memory_fft[None], cfg.n_fft,
                                        axis=-2, impl=hcfg.fft_impl)[0]
                mixed = mixed + mem_time[:n].astype(mixed.dtype)
            mixed = mixed.astype(x.dtype)
            if not deterministic and cfg.dropout_p > 0.0:
                keep = 1.0 - cfg.dropout_p
                mask = jax.random.bernoulli(rngs["dropout"], keep,
                                            mixed.shape)
                mixed = jnp.where(mask, mixed / keep, 0.0)
            return linear_apply(params["out_proj"], mixed)

        def run(hp, xi, mem, drng):
            return spectre_head_apply_causal(
                hp, hcfg, xi, causal_chunk=cfg.causal_chunk,
                causal_impl=cfg.causal_impl, memory_fft=mem,
                dropout_rng=drng, deterministic=deterministic)
    else:
        if (sp_mesh is not None and sp_layout == "strided"
                and cfg.wavelet_on_rate != 0.0):
            # Trace-time config error (not a bare assert: survives
            # python -O).  The strided layout hands each shard one residue
            # class of the sequence, while the Haar pyramid pairs adjacent
            # NATURAL positions — making it shard-local would need a full
            # contiguous reshard (2 extra all-to-alls) around the wavelet,
            # forfeiting exactly the 2-all-to-all optimality that is the
            # strided layout's reason to exist.  The contiguous SP layout
            # supports the wavelet as-is (Haar pairs never cross
            # even-length shard boundaries, so GSPMD keeps every level
            # shard-local until the residue is tiny — covered by
            # test_sp_block_wavelet_matches_single_device); see
            # docs/DESIGN.md "Parallelism map".
            raise ValueError(
                "wavelet refinement is order-sensitive and unsupported "
                "under sp_layout='strided'; use the contiguous SP layout "
                "or set wavelet_on_rate=0")

        def run(hp, xi, mem, drng):
            return spectre_head_apply(
                hp, hcfg, xi, pos_phase=pos_phase, memory_fft=mem,
                dropout_rng=drng, deterministic=deterministic,
                sp_mesh=sp_mesh, sp_layout=sp_layout)

    mixed, q_pools = jax.vmap(run, in_axes=tuple(in_axes))(*args)
    mixed = jnp.moveaxis(mixed, 0, 2).reshape(b, n, d)       # concat heads
    q_pool = jnp.moveaxis(q_pools, 0, 1).reshape(b, d)

    refined = wavelet_refinement_apply(
        params["wavelet"], mixed, q_pool, cfg.wavelet_on_rate,
        rng=None if rngs is None else rngs.get("wavelet"),
        deterministic=deterministic,
        reference_compat=cfg.wavelet_reference_compat,
    )
    return linear_apply(params["out_proj"], refined)


# ---------------------------------------------------------------------------
# Transformer block (spectre.py:892-982)
# ---------------------------------------------------------------------------

def spectre_block_init(key, cfg: SpectreConfig, dtype=jnp.float32):
    km, k1, k2, kmem = jax.random.split(key, 4)
    params = {
        "ln1": layernorm_init(cfg.embed_dim, dtype),
        "mix": spectre_multihead_init(km, cfg, dtype),
        "ln2": layernorm_init(cfg.embed_dim, dtype),
        "mlp": {
            "fc1": linear_init(k1, cfg.embed_dim,
                               cfg.mlp_ratio * cfg.embed_dim, dtype=dtype),
            "fc2": linear_init(k2, cfg.mlp_ratio * cfg.embed_dim,
                               cfg.embed_dim, dtype=dtype),
        },
    }
    bins = cfg.memory_freq_bins
    if bins > 0:
        # cfloat randn / sqrt(d): real & imag each N(0, 1/2)
        # (spectre.py:951-957); frozen — stop_gradient at use + optimizer
        # mask.  Stored as a real (2, bins, d) [re; im] pair so the param
        # pytree has no complex leaves (TPU transfer + checkpoint friendly).
        scale = 1.0 / math.sqrt(2.0 * cfg.embed_dim)
        params["memory_fft"] = (
            jax.random.normal(kmem, (2, bins, cfg.embed_dim), dtype) * scale)
    return params


def spectre_block_apply(
    params,
    cfg: SpectreConfig,
    x: jnp.ndarray,                      # (B, N, d)
    *,
    rngs: Optional[dict] = None,
    deterministic: bool = True,
    sp_mesh=None,
    sp_layout: str = "contiguous",
):
    """Pre-LN residual block: x + mix(LN(x), memory) ; x + MLP(LN(x))
    (spectre.py:967-982).  Runs in cfg.compute_dtype (params stay fp32)."""
    x = x.astype(cfg.compute_dtype)
    memory_pair = params.get("memory_fft")            # real (2, bins, d)
    memory_fft = None
    if memory_pair is not None:
        memory_pair = jax.lax.stop_gradient(memory_pair)
        memory_fft = jax.lax.complex(memory_pair[0], memory_pair[1])
        if cfg.memory_freq_bins < cfg.f_half:
            memory_fft = jnp.pad(
                memory_fft,
                ((0, cfg.f_half - cfg.memory_freq_bins), (0, 0)))
    x = x + spectre_multihead_apply(
        params["mix"], cfg, layernorm_apply(params["ln1"], x),
        memory_fft=memory_fft, rngs=rngs, deterministic=deterministic,
        sp_mesh=sp_mesh, sp_layout=sp_layout)
    h = layernorm_apply(params["ln2"], x)
    h = linear_apply(params["mlp"]["fc2"],
                     gelu_exact(linear_apply(params["mlp"]["fc1"], h)))
    return x + h
