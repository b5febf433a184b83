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


def preferred_causal_chunk(seq: int, d: int, fast: bool = True,
                           g_groups: int = 32, train: bool = False) -> int:
    """Fastest measured chunk size for the causal block on v5e.

    Measured on chip, round-5 sweep (`benchmarks/sweep_chunk_train.py`,
    bf16, 32k tokens/step, block fwd ms / fwd+bwd ms):

        seq 2048:  C512 4.04/11.8   C1024 4.22/13.3   C256 4.06/14.1
        seq 4096:  C512 4.15/14.1   C1024 4.43/12.4   C2048 7.01/16.5
        seq 8192:  C1024 5.15/15.7  C512 6.16/26.7    C2048 6.59/16.5
        seq 32768: C2048 11.5/66.9  C1024 23.3/69.2   C512 33.5/126.8

    so: 256 at seq 1k, 512 at 2k-4k, 1024 at 8k (both modes), and the
    v2/v3 kernels' chunk 2048 at 16k+; ``train=True`` flips 4k to 1024
    (the backward's nc^2-banded adjoint prefers fewer, larger chunks —
    12% cheaper per step — while the forward alone prefers 512).  64k+
    needs seq/32 so the v3 grid-banded kernel (chunk <= 2048) covers it.

    This is a THROUGHPUT default: larger chunks also lengthen the causal
    gate-descriptor lag (<= chunk tokens) — quality-sensitive configs can
    set ``causal_chunk`` explicitly.

    ``fast``/``g_groups`` mirror the gating ``segmented_causal_mix``
    applies at run time (fast = compute_dtype == 'bfloat16'; g_groups =
    the head's gate-group count).  The defaults match the measured-tuning
    config (bf16, 32 groups); pass the real values for f32 or unusual
    group counts so the chosen chunk is one the fused kernel will
    actually accept."""
    from fft_tpu.kernels.pallas_causal import fused_mix_supported
    if seq <= 8192:
        if seq <= 2048:
            pref = [min(512, seq // 4)]
        elif seq == 4096:
            pref = [1024, 512] if train else [512, 1024]
        else:
            pref = [1024, 512]
        cands = pref + [seq // 8, seq // 16]
    else:
        cands = [seq // 4] if seq // 4 >= 512 else []
        cands += [seq // 8, seq // 16]
        if seq // 32 >= 2048:
            cands.append(seq // 32)
    for c in dict.fromkeys(cands):
        if (c >= 128 and seq % c == 0
                and fused_mix_supported(seq // c, c, d, fast, g_groups)):
            return c
    return max(128, seq // 16)


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
    from fft_tpu.kernels.matfft import precision_for
    prec = precision_for(cfg.compute_dtype)

    # --- kernel segments ---------------------------------------------------
    # Both FFTs run with (nc * G) lane columns — the per-chunk kernels ride
    # the LANE axis together, so the length-N irfft and the 2C rffts hit
    # full 128-lane tiles instead of G(=32)-wide ones.  Only the small gate
    # transpose up front touches data sideways; the fused kernel consumes
    # this producer layout directly (lane l = c*G + g), so the nc^2-sized
    # spectra are never relayouted.  (Measured at seq 8k: 21.2 ms for the
    # per-(b, c) G-lane pipeline -> 5.8 ms lane-folded; the avoided
    # (j, F2, c) -> (c, j, F2) XLA transpose+pad cost a further ~3-8 ms.)
    g_l = jnp.transpose(gate, (0, 3, 1, 2)).reshape(
        b, gate.shape[-1], nc * g_groups)                  # (B, F, c*G)

    from fft_tpu.kernels import pallas_causal as pc
    import jax as _jax
    use_pallas = (cfg.fft_impl == "pallas"
                  or (cfg.fft_impl == "auto"
                      and _jax.default_backend() != "cpu"))
    fast = cfg.compute_dtype == "bfloat16"

    # --- fully-fused Pallas path ------------------------------------------
    # kf-kernel gate: measured on v5e (benchmarks/ablate_kf.py) — the
    # kernel wins at n_fft 1024 (0.68 vs 1.17 ms) and 8192 (0.74 vs 0.94),
    # is a wash at 4096, and LOSES at 2048 with 128 lanes (0.69 vs 0.50:
    # too few programs to fill the chip); matfft keeps that case.
    use_kf = (pc.kf_spectra_supported(cfg.n_fft, chunk)
              and n == cfg.n_fft and (nc * g_groups) % 128 == 0
              and (cfg.n_fft != 2048 or nc * g_groups >= 256))
    if (use_pallas and pc.fused_mix_supported(nc, chunk, d, fast, g_groups)
            and use_kf):
        # kf kernel: gate -> kernel-segment spectra in one VMEM pass
        # (replaces the length-N irfft + nc rfft_2C matfft pipeline, the
        # block's largest remaining cost at seq >= 4k), then v2: segment
        # rFFTs + banded sum + partial irFFT in ONE kernel that reads raw
        # values once (no HBM segment-spectra round trip at all).
        kfr, kfi = pc.kf_spectra(jnp.real(g_l), jnp.imag(g_l), cfg.n_fft,
                                 chunk, fast, pc.INTERPRET)
        y = pc.fused_causal_mix(v, kfr, kfi, chunk, g_groups, fast,
                                pc.INTERPRET)
        return y.astype(v.dtype)

    k_time = fftops.irfft(g_l, cfg.n_fft, axis=-2, impl=impl,
                          precision=prec)                  # (B, N, c*G)

    # --- fused Pallas mix (kf segment spectra via kernel or matfft) --------
    if use_pallas and pc.fused_mix_supported(nc, chunk, d, fast, g_groups):
        if (n >= pc.KF_SEG_MIN_N and pc.kf_seg_rfft_supported(n, chunk)
                and (nc * g_groups) % 128 == 0):
            # one VMEM pass over k_time instead of nc complex rfft_2C
            # einsums round-tripping (B, nc, 2C, L) intermediates via HBM
            kfr, kfi = pc.kf_seg_rfft(k_time[:, :n], chunk, fast,
                                      pc.INTERPRET)
        else:
            k_seg = k_time[:, :n].reshape(b, nc, chunk, nc * g_groups)
            kf_l = fftops.rfft(k_seg, c2, axis=-2, impl=impl,
                               precision=prec)             # (B, j, F2, c*G)
            kfr, kfi = jnp.real(kf_l), jnp.imag(kf_l)
        y = pc.fused_causal_mix(v, kfr, kfi, chunk, g_groups, fast,
                                pc.INTERPRET)
        return y.astype(v.dtype)

    k_seg = k_time[:, :n].reshape(b, nc, chunk, nc * g_groups)
    kf_l = fftops.rfft(k_seg, c2, axis=-2, impl=impl,
                       precision=prec)                     # (B, j, F2, c*G)

    # fallback paths consume the chunk-major (B, c, j, F2, G) layout
    kf = jnp.transpose(kf_l.reshape(b, nc, f2, nc, g_groups),
                       (0, 3, 1, 2, 4))                    # (B,c,j,F2,G)

    # --- segment spectra: V_s = rfft_2C([v_{s-1} | v_s]) ------------------
    vs = v.astype(jnp.float32).reshape(b, nc, chunk, d)
    v_prev = jnp.pad(vs[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    seg = jnp.concatenate([v_prev, vs], axis=2)            # (B, nc, 2C, d)
    vf = fftops.rfft(seg, c2, axis=-2, impl=impl, precision=prec)          # (B, nc, F2, d)

    if use_pallas and d % 128 == 0 and pc.banded_supported(nc, f2):
        # v1: banded sum + partial irfft fused (spectra still via HBM);
        # covers chunk sizes past the v2 VMEM budget
        y = pc.banded_inverse(
            jnp.real(vf), jnp.imag(vf), jnp.real(kf), jnp.imag(kf),
            chunk, fast, pc.INTERPRET)
        return y.reshape(b, n, d).astype(v.dtype)

    # --- banded causal sum: Y_c = sum_j K_c^(j) (.) V_{c-j} ---------------
    # Unrolled over the (small) segment lag j as SHIFTED ELEMENTWISE
    # multiply-adds — an einsum formulation lowers to thousands of tiny
    # (nc x nc) matmuls that strand the MXU; these are nc large VPU ops.
    # (pad-and-shift rather than scatter-add: sliced scatter onto a
    # sequence-sharded axis miscompiles under GSPMD; shifted full-width
    # elementwise ops shard cleanly)
    vf_grp = vf.reshape(b, nc, f2, g_groups, d_g)
    y_spec = jnp.zeros((b, nc, f2, g_groups, d_g), vf.dtype)
    for j in range(nc):
        kj = kf[:, :, j][..., None]                        # (b, c, f2, G, 1)
        vj = jnp.pad(vf_grp,
                     ((0, 0), (j, 0), (0, 0), (0, 0), (0, 0)))[:, :nc]
        y_spec = y_spec + kj * vj                          # V_{c-j}, 0 if c<j
    y_spec = y_spec.reshape(b, nc, f2, d)

    y = fftops.irfft(y_spec, c2, axis=-2, impl=impl,
                     precision=prec)[:, :, chunk:, :]
    return y.reshape(b, n, d).astype(v.dtype)
