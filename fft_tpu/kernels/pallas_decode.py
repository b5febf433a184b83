"""Fused Pallas decode-step kernel: phasor update + gated mix + pruned
single-position irFFT in ONE pass over the prefix-FFT state.

**Measured result: NOT enabled by default.**  The hypothesis was that the
jnp decode step reads the (B, H, F, hd) prefix three times per token
(update read+write + mix read) and a one-pass kernel would halve the
traffic.  Measured on v5e (B=8, d=512, n_fft=1024, deep-scan slope
timing): jnp path 0.028 ms/token — already ~1.3x the ideal TWO-pass
bandwidth floor (0.021), i.e. XLA's loop fusion through the scan body
already merges the update and mix passes.  This kernel measured 0.248
ms/token: the per-head unrolled loop runs 64-lane tiles and K=4/M=1
matmuls that the MXU hates.  Kept (with its parity test) as the recorded
experiment; enable via ``ENABLE=True`` to reproduce the numbers.

Position-dependent small vectors (the insert phasor at ring slot j and
the pruned-irFFT row at output position pos, both (F,)) are computed
outside in XLA from the traced step counter and passed in as operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# CPU tests run the kernel through the Pallas interpreter.
INTERPRET = False
# Dispatch gate (see module docstring): the jnp decode path is faster on
# the measured backend, so the kernel is opt-in.
ENABLE = False


def _make_kernel(h: int, f: int, hd: int, g: int, precision):
    def kernel(pre_r_ref, pre_i_ref, gr_ref, gi_ref, dlt_ref,
               ph_r_ref, ph_i_ref, w_r_ref, w_i_ref, e_ref,
               out_r_ref, out_i_ref, y_ref):
        ph_r = ph_r_ref[:]                         # (1, F)
        ph_i = ph_i_ref[:]
        w_r = w_r_ref[:]                           # (1, F)
        w_i = w_i_ref[:]
        e = e_ref[:]                               # (G, hd) one-hot expand

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        for hh in range(h):                        # static unroll over heads
            delta = dlt_ref[0, hh]                 # (1, hd) sublane row
            # rank-1 phasor update: prefix += ph (outer) delta
            new_r = pre_r_ref[0, hh] + ph_r.reshape(f, 1) * delta
            new_i = pre_i_ref[0, hh] + ph_i.reshape(f, 1) * delta
            out_r_ref[0, hh] = new_r
            out_i_ref[0, hh] = new_i
            # gated mix: gate arrives (F, G); expand groups to hd lanes
            g_r = mm(gr_ref[0, hh], e)             # (F, hd)
            g_i = mm(gi_ref[0, hh], e)
            mix_r = g_r * new_r - g_i * new_i
            mix_i = g_r * new_i + g_i * new_r
            # pruned irFFT at pos: y = w_r @ Re + w_i @ Im  (coefs folded)
            y_ref[0, hh] = mm(w_r, mix_r) + mm(w_i, mix_i)   # (1, hd)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_mix(pre_r, pre_i, gate_r, gate_i, delta,
                     ph_r, ph_i, w_r, w_i, *, interpret=False):
    """One decode step over the prefix state.

    pre_r/pre_i: (B, H, F, hd) prefix planes; gate_r/gate_i: (B, H, F, G);
    delta: (B, H, 1, hd) value update (v_t - evict * v_old);
    ph_r/ph_i: (1, F) insert phasor at ring slot j;
    w_r/w_i: (1, F) pruned-irFFT row at the output position.

    Returns (new_pre_r, new_pre_i, y) with y (B, H, 1, hd); the prefix
    outputs alias their inputs (updated in place under jit donation)."""
    b, h, f, hd = pre_r.shape
    g = gate_r.shape[-1]
    kernel = _make_kernel(h, f, hd, g, jax.lax.Precision.HIGHEST)
    d_per = hd  # one-hot expands G gate columns onto hd head lanes
    e = np.zeros((g, hd), np.float32)
    for l in range(hd):
        e[l // (hd // g), l] = 1.0

    spec4 = lambda s3: pl.BlockSpec((1,) + s3, lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    cvec = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kwargs = {}
    if not interpret:
        from fft_tpu.kernels.pallas_causal import _VMEM_LIMIT
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, f, hd), pre_r.dtype),
            jax.ShapeDtypeStruct((b, h, f, hd), pre_i.dtype),
            jax.ShapeDtypeStruct((b, h, 1, hd), pre_r.dtype),
        ),
        in_specs=[
            spec4((h, f, hd)), spec4((h, f, hd)),
            spec4((h, f, g)), spec4((h, f, g)),
            spec4((h, 1, hd)),
            cvec, cvec, cvec, cvec,
            pl.BlockSpec((g, hd), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            spec4((h, f, hd)), spec4((h, f, hd)), spec4((h, 1, hd)),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        **kwargs,
    )(pre_r, pre_i, gate_r, gate_i, delta, ph_r, ph_i, w_r, w_i,
      jnp.asarray(e))
    return out
