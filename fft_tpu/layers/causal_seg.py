"""Segmented (overlap-save) causal spectral mixing.

Mathematically identical to the 2N-FFT chunked-causal path in
``spectre_head_apply_causal`` (same per-chunk kernels k_c = irfft(gate_c),
same strictly-past linear convolution), but organized as block convolution:

    V_s     = rfft_2C([v_{s-1} | v_s])                  (segment spectra)
    Y_c     = irfft_2C( sum_j K_c^(j) (.) V_{c-j} )[C:] (output chunk c)
    K_c^(j) = rfft_2C(k_c[jC:(j+1)C])                   (kernel segments)

Why it exists:
- **Sequence parallelism for causal models** (BASELINE config 4): segment
  spectra are shard-local (one neighbor halo per segment); the causal
  pairwise sum needs each chunk owner to see PAST segment spectra — one
  all-gather over the 'seq' axis per layer, which GSPMD inserts from the
  banded einsum.  The 2N-FFT formulation offers no such locality.
- At small chunk sizes it is also a faster single-device algorithm
  (nc FFTs of length 2C + an MXU-friendly banded contraction, vs nc FFTs
  of length 2N).

Cost: O(nc^2 * C * G * B) for the banded kernel-segment contraction +
O(N log C) FFT work per (batch, channel).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fft_tpu.config import SpectreHeadConfig
from fft_tpu.ops import fftops


def segmented_causal_mix(
    v: jnp.ndarray,           # (B, N, d) values, N divisible by chunk
    gate: jnp.ndarray,        # (B, nc, G, F_half) per-chunk gates
    cfg: SpectreHeadConfig,
    chunk: int,
) -> jnp.ndarray:
    """y[p in chunk c] = sum_{m < n_fft} k_c[m] * v[p-m] for every chunk,
    via overlap-save block convolution.  Returns (B, N, d)."""
    b, n, d = v.shape
    g_groups = gate.shape[2]
    d_g = d // g_groups
    nc = n // chunk
    assert nc * chunk == n, (n, chunk)
    c2 = 2 * chunk
    f2 = c2 // 2 + 1
    impl = cfg.fft_impl if cfg.fft_impl != "pallas" else "matmul"

    # --- segment spectra: V_s = rfft_2C([v_{s-1} | v_s]) ------------------
    vs = v.astype(jnp.float32).reshape(b, nc, chunk, d)
    v_prev = jnp.pad(vs[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    seg = jnp.concatenate([v_prev, vs], axis=2)            # (B, nc, 2C, d)
    vf = fftops.rfft(seg, c2, axis=-2, impl=impl)          # (B, nc, F2, d)

    # --- kernel segments ---------------------------------------------------
    k_time = fftops.irfft(gate, cfg.n_fft, axis=-1, impl=impl)
    k_time = k_time[..., :n]                               # window <= N here
    k_segs = k_time.reshape(b, nc, g_groups, nc, chunk)    # (B,c,G,j,C)
    kf = fftops.rfft(k_segs, c2, axis=-1, impl=impl)       # (B,c,G,j,F2)

    # --- fused Pallas path: banded sum + partial irfft in one VMEM pass ---
    from fft_tpu.kernels import pallas_causal as pc
    import jax as _jax
    use_pallas = (cfg.fft_impl == "pallas"
                  or (cfg.fft_impl == "auto"
                      and _jax.default_backend() != "cpu"))
    if use_pallas and d % 128 == 0 and pc.banded_supported(nc, f2):
        kfc = jnp.transpose(kf, (0, 1, 3, 4, 2))       # (B, c, j, F2, G)
        y = pc.banded_inverse(
            jnp.real(vf), jnp.imag(vf), jnp.real(kfc), jnp.imag(kfc),
            chunk, cfg.compute_dtype == "bfloat16", pc.INTERPRET)
        return y.reshape(b, n, d).astype(v.dtype)

    # --- banded causal sum: Y_c = sum_j K_c^(j) (.) V_{c-j} ---------------
    # Unrolled over the (small) segment lag j as SHIFTED ELEMENTWISE
    # multiply-adds — an einsum formulation lowers to thousands of tiny
    # (nc x nc) matmuls that strand the MXU; these are nc large VPU ops.
    # (pad-and-shift rather than scatter-add: sliced scatter onto a
    # sequence-sharded axis miscompiles under GSPMD; shifted full-width
    # elementwise ops shard cleanly)
    vf_grp = vf.reshape(b, nc, f2, g_groups, d_g)
    kf_c = jnp.moveaxis(kf, 3, 1)                          # (b, j, c, G, f2)
    y_spec = jnp.zeros((b, nc, f2, g_groups, d_g), vf.dtype)
    for j in range(nc):
        kj = jnp.moveaxis(kf_c[:, j], -2, -1)[..., None]   # (b, c, f2, G, 1)
        vj = jnp.pad(vf_grp,
                     ((0, 0), (j, 0), (0, 0), (0, 0), (0, 0)))[:, :nc]
        y_spec = y_spec + kj * vj                          # V_{c-j}, 0 if c<j
    y_spec = y_spec.reshape(b, nc, f2, d)

    y = fftops.irfft(y_spec, c2, axis=-2, impl=impl)[:, :, chunk:, :]
    return y.reshape(b, n, d).astype(v.dtype)
