"""MXU-native batched real FFT via mixed-radix DFT matmuls.

TPU-first replacement for the reference's ``torch.fft.rfft/irfft``
(spectre.py:506, 551, 777).  Instead of a scalar butterfly network (which
maps poorly to the MXU), the transform is decomposed Cooley-Tukey style into
a handful of *dense DFT matmuls* over radices <= 128 plus elementwise twiddle
multiplies:

    n = p * q :  X[c + p*kq] = DFT_q_{kq,b}( T[c,b] * DFT_p_{c,a}( x[a*q+b] ) )

Each DFT_r is an r x r constant matrix contraction — exactly what the
128x128 systolic array wants — and the twiddle is a VPU elementwise multiply
that XLA fuses into the matmul epilogue.  The transform runs along axis -2
so the model/channel dimension stays on the 128-lane minor axis throughout:
no data transposes, only reshapes and einsums.

The real transform uses the standard pack-to-complex trick: rFFT(n) =
complex FFT(n/2) of z[m] = x[2m] + i*x[2m+1], untangled with the hermitian
split — halving both FLOPs and bytes vs. a complex FFT of length n.

Everything is linear, so autodiff through these functions is exact (no
custom VJP needed).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAX_RADIX = 128
_PRECISION = jax.lax.Precision.HIGHEST  # fp32-accurate MXU passes (default)


def precision_for(compute_dtype) -> jax.lax.Precision:
    """MXU pass policy for the DFT matmuls given a model compute dtype.

    bfloat16 models run single-pass bf16 matmuls (~3e-3 rel on a length-8k
    transform chain, inside the bf16 activation budget and 6x fewer MXU
    passes); anything else keeps the fp32-accurate 6-pass HIGHEST.
    """
    return (jax.lax.Precision.DEFAULT
            if jnp.dtype(compute_dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _prime_factors(n: int) -> Optional[List[int]]:
    out = []
    m = n
    for p in (2, 3, 5, 7, 11, 13):
        while m % p == 0:
            out.append(p)
            m //= p
    if m != 1:
        return None if m > _MAX_RADIX else out + [m]
    return out


@functools.lru_cache(maxsize=None)
def cfft_factors(n: int) -> Optional[Tuple[int, ...]]:
    """Radix plan for a COMPLEX DFT of length n: factors <= 128, roughly
    balanced.  None if a prime factor exceeds 128."""
    if n < 1:
        return None
    if n == 1:
        return (1,)
    if n & (n - 1) == 0:  # power of two: balanced 2^ceil(k/m) factors
        k = n.bit_length() - 1
        m = math.ceil(k / 7)
        # The composition is HBM-pass-bound at these lengths, so when a
        # larger radix saves a whole recursion LEVEL (one full-size
        # transpose + twiddle pass per transform), take it even though it
        # raises radix_sum (FLOPs): radix 256 is still one dense MXU
        # contraction.  Chip A/B at n=32768 (benchmarks/ablate_fft_plan.py,
        # 64k unfused mix): (256,128) = 12.19 ms vs balanced (32,32,32) =
        # 14.24 and lopsided (128,128,2) = 15.19.
        m8 = math.ceil(k / 8)
        if m8 < m:
            m = m8
        base, rem = divmod(k, m)
        return tuple(2 ** (base + (1 if i < rem else 0)) for i in range(m))
    primes = _prime_factors(n)
    if primes is None:
        return None
    primes.sort(reverse=True)
    factors: List[int] = []
    for p in primes:
        for i, f in enumerate(factors):
            if f * p <= _MAX_RADIX:
                factors[i] = f * p
                break
        else:
            factors.append(p)
    factors.sort(reverse=True)
    return tuple(factors)


def plan_factors(n: int) -> Optional[Tuple[int, ...]]:
    """Radix plan for ``rfft_matmul`` of length ``n``: factors of the packed
    complex transform length n/2.  None if unsupported (odd n, or a prime
    factor > 128)."""
    if n < 4 or n % 2:
        return None
    return cfft_factors(n // 2)


# The cached constants below are **numpy** arrays: caching jnp arrays would
# capture trace-scoped constants when first used inside a jit trace and leak
# tracers into later traces.  jnp.asarray at each use is free at trace time
# and XLA dedups the embedded constants.

@functools.lru_cache(maxsize=None)
def _dft_matrix_np(p: int, sign: int) -> np.ndarray:
    """(p, p) complex64 DFT matrix W[k, a] = exp(sign * 2pi*i * k*a / p)."""
    idx = np.arange(p)
    ang = (sign * 2.0 * np.pi / p) * np.outer(idx, idx)
    return np.exp(1j * ang).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _twiddle_np(p: int, q: int, sign: int) -> np.ndarray:
    """(p, q) twiddle T[c, b] = exp(sign * 2pi*i * c*b / (p*q))."""
    ang = (sign * 2.0 * np.pi / (p * q)) * np.outer(np.arange(p), np.arange(q))
    return np.exp(1j * ang).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _half_phasor_np(n: int, sign: int) -> np.ndarray:
    """(n//2 + 1,) phasor exp(sign * 2pi*i * k / n) for the rFFT untangle."""
    k = np.arange(n // 2 + 1)
    return np.exp(sign * 2j * np.pi * k / n).astype(np.complex64)


def _dft_matrix(p: int, sign: int) -> jnp.ndarray:
    return jnp.asarray(_dft_matrix_np(p, sign))


def _twiddle(p: int, q: int, sign: int) -> jnp.ndarray:
    return jnp.asarray(_twiddle_np(p, q, sign))


def _half_phasor(n: int, sign: int) -> jnp.ndarray:
    return jnp.asarray(_half_phasor_np(n, sign))


def _cfft(x: jnp.ndarray, factors: Tuple[int, ...], sign: int,
          precision=_PRECISION) -> jnp.ndarray:
    """Complex DFT along axis -2 of ``x (..., n, d)``; n = prod(factors)."""
    if len(factors) == 1:
        w = _dft_matrix(factors[0], sign)
        return jnp.einsum("ka,...ad->...kd", w, x, precision=precision)
    p, rest = factors[0], factors[1:]
    q = math.prod(rest)
    d = x.shape[-1]
    xr = x.reshape(*x.shape[:-2], p, q, d)
    y = jnp.einsum("ca,...aqd->...cqd", _dft_matrix(p, sign), xr,
                   precision=precision)
    y = y * _twiddle(p, q, sign)[:, :, None]
    w = _cfft(y, rest, sign, precision)           # transform along the q axis
    # Output index k = c + p * kq  ->  kq-major layout.
    w = jnp.swapaxes(w, -3, -2)
    return w.reshape(*x.shape[:-2], p * q, d)


def _move_to_penultimate(x: jnp.ndarray, axis: int):
    axis = axis % x.ndim
    squeeze = False
    if axis == x.ndim - 1:
        # Last-axis transform: transpose so ALL other dims become the lane
        # dimension (a singleton lane would waste 127/128 of the VPU/MXU).
        lead = x.shape[:-1]
        x = jnp.moveaxis(x.reshape(-1, x.shape[-1]), 0, -1)   # (n, M)
        squeeze = lead                    # remember how to restore
        axis = 0
    if axis != x.ndim - 2:
        x = jnp.moveaxis(x, axis, -2)
    return x, axis, squeeze


def rfft_matmul(x: jnp.ndarray, n: int, axis: int = -2,
                precision=_PRECISION) -> jnp.ndarray:
    """rFFT of real ``x`` along ``axis``, padded/truncated to length n.
    Returns complex64 of length n//2 + 1 along ``axis``."""
    factors = plan_factors(n)
    assert factors is not None, f"unsupported rfft size {n}"
    orig_axis = axis % x.ndim
    x, _, squeeze = _move_to_penultimate(x, axis)
    length = x.shape[-2]
    if length < n:
        pad = [(0, 0)] * x.ndim
        pad[-2] = (0, n - length)
        x = jnp.pad(x, pad)
    elif length > n:
        x = x[..., :n, :]
    x = x.astype(jnp.float32)
    n2 = n // 2
    z = jax.lax.complex(x[..., 0::2, :], x[..., 1::2, :])    # (..., n2, d)
    zf = _cfft(z, factors, sign=-1, precision=precision)
    # Hermitian untangle: Ze = FFT(even), Zo = FFT(odd).
    z_ext = jnp.concatenate([zf, zf[..., :1, :]], axis=-2)   # Z[k], k=0..n2
    z_rev = jnp.concatenate(
        [zf[..., :1, :], zf[..., 1:, :][..., ::-1, :], zf[..., :1, :]],
        axis=-2)                                              # Z[(n2-k) % n2]
    ze = 0.5 * (z_ext + jnp.conj(z_rev))
    zo = -0.5j * (z_ext - jnp.conj(z_rev))
    out = ze + _half_phasor(n, -1)[:, None] * zo              # (..., n2+1, d)
    if squeeze is not False:
        out = jnp.moveaxis(out, -1, 0).reshape(*squeeze, n // 2 + 1)
    elif orig_axis != out.ndim - 2:
        out = jnp.moveaxis(out, -2, orig_axis)
    return out


def irfft_matmul(xh: jnp.ndarray, n: int, axis: int = -2,
                 precision=_PRECISION) -> jnp.ndarray:
    """Inverse rFFT: ``xh (..., n//2+1, ...)`` complex -> real length-n."""
    factors = plan_factors(n)
    assert factors is not None, f"unsupported irfft size {n}"
    orig_axis = axis % xh.ndim
    xh, _, squeeze = _move_to_penultimate(xh, axis)
    assert xh.shape[-2] == n // 2 + 1, (xh.shape, n)
    xh = xh.astype(jnp.complex64)
    # numpy/torch irfft convention: the imaginary parts of the
    # self-conjugate DC and Nyquist bins are ignored.
    bins = xh.shape[-2]
    self_conj = (jnp.arange(bins) % (bins - 1)) == 0          # k=0 and k=n2
    xh = jnp.where(self_conj[:, None], jnp.real(xh).astype(xh.dtype), xh)
    x_rev = jnp.conj(xh[..., ::-1, :])                        # conj X[n2 - k]
    ze = 0.5 * (xh + x_rev)
    zo = 0.5 * _half_phasor(n, +1)[:, None] * (xh - x_rev)
    z_spec = (ze + 1j * zo)[..., :-1, :]                      # Z[k], k=0..n2-1
    n2 = n // 2
    z = _cfft(z_spec, factors, sign=+1, precision=precision) / n2
    out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-2)      # (..., n2, 2, d)
    out = out.reshape(*z.shape[:-2], n, z.shape[-1])
    if squeeze is not False:
        out = jnp.moveaxis(out, -1, 0).reshape(*squeeze, n)
    elif orig_axis != out.ndim - 2:
        out = jnp.moveaxis(out, -2, orig_axis)
    return out


# ---------------------------------------------------------------------------
# Split-real bf16-resident composition for the LONG fast-mode mix.
#
# Past the fused kernels' reach (n_fft >= 16384) the spectral mix runs as
# rfft_matmul -> gate -> irfft_matmul, and the round-5 roofline rows show
# that path is HBM-PASS-bound, not MXU-bound (10-11% of the matmul bound
# at 16k/32k): every _cfft level materializes full-size complex64 (f32
# re/im) intermediates through HBM.  In fast mode the MXU passes already
# run bf16, so f32 *storage* between levels buys nothing — this variant
# keeps every full-size intermediate as separate re/im planes in bf16
# (halving the bytes of each pass) and accumulates each contraction in
# f32 on the MXU.  Re/im ride one lane-concatenated array per operand, so
# each level is TWO wide matmuls instead of a complex einsum's four.
#
# Accuracy: bf16 storage adds ~1e-2 relative error on a 64k transform
# chain — inside the fast-mode (bfloat16 activations) budget; exact mode
# keeps the f32 complex path.
# ---------------------------------------------------------------------------


def _cfft_sr(xr: jnp.ndarray, xi: jnp.ndarray, factors: Tuple[int, ...],
             sign: int, store=jnp.bfloat16):
    """Complex DFT along axis -2 on split re/im planes ``(..., n, d)``;
    intermediates stored in ``store``, contractions accumulated in f32."""
    w = _dft_matrix_np(factors[0], sign)
    wr = jnp.asarray(w.real.astype(np.float32)).astype(store)
    wi = jnp.asarray(w.imag.astype(np.float32)).astype(store)
    d = xr.shape[-1]

    def mm(m, z, axis):
        return jax.lax.dot_general(
            m, z, (((1,), (axis % z.ndim,)), ((), ())),
            preferred_element_type=jnp.float32)

    if len(factors) == 1:
        z = jnp.concatenate([xr, xi], axis=-1).astype(store)
        ar = jnp.moveaxis(mm(wr, z, -2), 0, -2)       # [wr xr | wr xi]
        ai = jnp.moveaxis(mm(wi, z, -2), 0, -2)       # [wi xr | wi xi]
        yr = ar[..., :d] - ai[..., d:]
        yi = ar[..., d:] + ai[..., :d]
        return yr.astype(store), yi.astype(store)

    p, rest = factors[0], factors[1:]
    q = math.prod(rest)
    lead = xr.shape[:-2]
    zr = xr.reshape(*lead, p, q, d)
    zi = xi.reshape(*lead, p, q, d)
    z = jnp.concatenate([zr, zi], axis=-1).astype(store)   # (..., p, q, 2d)
    ar = jnp.moveaxis(mm(wr, z, -3), 0, -3)           # (..., c, q, 2d)
    ai = jnp.moveaxis(mm(wi, z, -3), 0, -3)
    yr = ar[..., :d] - ai[..., d:]
    yi = ar[..., d:] + ai[..., :d]
    tw = _twiddle_np(p, q, sign)
    twr = jnp.asarray(tw.real.astype(np.float32))[:, :, None]
    twi = jnp.asarray(tw.imag.astype(np.float32))[:, :, None]
    tr = yr * twr - yi * twi
    ti = yr * twi + yi * twr
    wr_, wi_ = _cfft_sr(tr.astype(store), ti.astype(store), rest, sign,
                        store)
    # output index k = c + p * kq -> kq-major
    wr_ = jnp.swapaxes(wr_, -3, -2).reshape(*lead, p * q, d)
    wi_ = jnp.swapaxes(wi_, -3, -2).reshape(*lead, p * q, d)
    return wr_, wi_


def mix_matmul_bf16(v: jnp.ndarray, gate_r: jnp.ndarray,
                    gate_i: jnp.ndarray, n: int):
    """Fast-mode spectral mix irfft(gate * rfft(v, n)) with every
    full-size intermediate in bf16 split-real planes.  ``v (B, n, d)``
    real; ``gate_{r,i} (B, n//2+1, hg)`` with hg | d (compact gate,
    broadcast over channels).  Returns (B, n, d) in v.dtype.

    Same math as rfft_matmul/irfft_matmul + complex gate multiply
    (reference call sites spectre.py:506,551) — restructured so the
    HBM-pass-bound 16k-64k regime moves half the bytes per pass."""
    factors = plan_factors(n)
    assert factors is not None, f"unsupported mix size {n}"
    b, length, d = v.shape
    assert length == n, (v.shape, n)
    hg = gate_r.shape[-1]
    assert d % hg == 0, (d, hg)
    n2 = n // 2
    store = jnp.bfloat16

    x = v.astype(store)
    zr = x[..., 0::2, :]                              # pack-to-complex
    zi = x[..., 1::2, :]
    fr, fi = _cfft_sr(zr, zi, factors, sign=-1, store=store)

    # hermitian untangle in f32 compute (small elementwise passes)
    fr32 = fr.astype(jnp.float32)
    fi32 = fi.astype(jnp.float32)
    er = jnp.concatenate([fr32, fr32[..., :1, :]], axis=-2)
    ei = jnp.concatenate([fi32, fi32[..., :1, :]], axis=-2)
    rr = jnp.concatenate(
        [fr32[..., :1, :], fr32[..., 1:, :][..., ::-1, :],
         fr32[..., :1, :]], axis=-2)
    ri = jnp.concatenate(
        [fi32[..., :1, :], fi32[..., 1:, :][..., ::-1, :],
         fi32[..., :1, :]], axis=-2)
    zer = 0.5 * (er + rr)
    zei = 0.5 * (ei - ri)
    zor = 0.5 * (ei + ri)                             # -0.5i * (z - conj)
    zoi = -0.5 * (er - rr)
    ph = _half_phasor_np(n, -1)
    phr = jnp.asarray(ph.real.astype(np.float32))[:, None]
    phi = jnp.asarray(ph.imag.astype(np.float32))[:, None]
    sr = zer + phr * zor - phi * zoi                  # rfft re, (n2+1)
    si = zei + phr * zoi + phi * zor                  # rfft im

    # compact gate multiply, broadcast over d // hg channels per column
    gr = jnp.repeat(gate_r.astype(jnp.float32), d // hg, axis=-1)
    gi = jnp.repeat(gate_i.astype(jnp.float32), d // hg, axis=-1)
    mr = gr * sr - gi * si
    mi = gr * si + gi * sr

    # irfft: numpy/torch convention ignores Im at the self-conjugate bins
    bins = n2 + 1
    self_conj = (jnp.arange(bins) % max(1, bins - 1)) == 0
    mi = jnp.where(self_conj[:, None], 0.0, mi)
    # conj X[n2-k]: straight flip of the (n2+1)-length array, negated im
    vr = mr[..., ::-1, :]
    vi = -mi[..., ::-1, :]
    ber = 0.5 * (mr + vr)
    bei = 0.5 * (mi + vi)
    phI = _half_phasor_np(n, +1)
    pIr = jnp.asarray(phI.real.astype(np.float32))[:, None]
    pIi = jnp.asarray(phI.imag.astype(np.float32))[:, None]
    dr = mr - vr
    di = mi - vi
    bor = 0.5 * (pIr * dr - pIi * di)
    boi = 0.5 * (pIr * di + pIi * dr)
    zsr = (ber - boi)[..., :-1, :]                    # ze + i*zo, re
    zsi = (bei + bor)[..., :-1, :]                    # ... im
    tr_, ti_ = _cfft_sr(zsr.astype(store), zsi.astype(store), factors,
                        sign=+1, store=store)
    outr = tr_.astype(jnp.float32) / n2
    outi = ti_.astype(jnp.float32) / n2
    out = jnp.stack([outr, outi], axis=-2)            # (..., n2, 2, d)
    return out.reshape(b, n, d).astype(v.dtype)
