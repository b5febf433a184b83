"""Sequence-parallel spectral mixing via the distributed four-step FFT.

The SP story for SPECTRE (SURVEY §2.4/§5): because the mix is a pointwise
product in frequency (no pairwise attention scores), sequence parallelism
reduces to the classic four-step/Bailey distributed FFT —

    n = N1 * N2,  x viewed as (N1, N2) row-major, sequence sharded on N1:
    1. local DFT_N2 along n2          (rows are shard-local)
    2. twiddle  exp(-2pi*i*n1*k2/n)   (pointwise)
    3. reshard N1-sharded -> k2-sharded  == the all-to-all transpose
    4. local DFT_N1 along n1
    spectral gate multiply (pointwise, frequency-sharded)
    inverse: mirror of the above, landing back in natural sequence sharding.

Exactly two all-to-alls per mix layer, riding the ICI 'seq' mesh axis.

Implementation: each DFT stage is a dense matmul (fft_tpu.kernels.matfft
machinery) and the transpose is a ``with_sharding_constraint`` axis swap —
GSPMD lowers the reshard to all-to-all.  Everything is jnp einsum, so it
composes with vmap over heads and autodiff, and runs identically on a fake
CPU mesh for tests.

The transform is complex-of-real (a factor ~2 over the packed rFFT — the
hermitian untangle would need a cross-shard flip-permute; revisit if SP FFT
ever dominates profiles).  The frequency-domain layout is (k1, k2) with
k = k1 + N1*k2 — gates are evaluated directly in that permuted layout, so
no reordering pass is ever needed.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fft_tpu.kernels.matfft import _cfft, cfft_factors

_PRECISION = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _twiddle2_np(n1: int, n2: int, sign: int) -> np.ndarray:
    ang = (sign * 2.0 * np.pi / (n1 * n2)) * np.outer(np.arange(n1),
                                                      np.arange(n2))
    return np.exp(1j * ang).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _freq_map_np(n: int, n1: int):
    """Global frequency index k(k1, k2) = k1 + n1*k2 and its mapping onto the
    half-spectrum: (half_index, conj_sign, self_conj_mask) as (n1, n2)."""
    n2 = n // n1
    k1 = np.arange(n1)[:, None]
    k2 = np.arange(n2)[None, :]
    k = k1 + n1 * k2
    half = np.minimum(k, n - k)            # index into F_half = n//2+1 bins
    conj = np.where(k > n - k, -1.0, 1.0)  # conj for the mirrored half
    self_conj = (k == 0) | (k == n - k)    # DC / Nyquist: real part only
    return (half.astype(np.int32), conj.astype(np.float32), self_conj)


def _full_gate(gate_half: jnp.ndarray, n: int, n1: int) -> jnp.ndarray:
    """Hermitian extension of a half-spectrum filter onto the permuted
    (k1, k2) grid: G[k] for k<=n/2, conj(G[n-k]) beyond, real parts at the
    self-conjugate bins (matching the irfft convention the layer relies on).

    gate_half: (..., F_half) complex -> (..., n1, n2) complex.
    """
    half, conj, self_conj = _freq_map_np(n, n1)
    g = jnp.take(gate_half, jnp.asarray(half.ravel()), axis=-1)
    g = g.reshape(*gate_half.shape[:-1], *half.shape)
    g = jax.lax.complex(jnp.real(g), jnp.imag(g) * jnp.asarray(conj))
    g = jnp.where(jnp.asarray(self_conj),
                  jax.lax.complex(jnp.real(g), jnp.zeros_like(jnp.real(g))),
                  g)
    return g


def sp_plan(n: int, seq_shards: int) -> int:
    """Pick N1 (the shard-major factor): the smallest multiple of the shard
    count that keeps both factor DFTs radix-decomposable."""
    n1 = seq_shards
    while n1 <= n:
        if n % n1 == 0 and cfft_factors(n1) and cfft_factors(n // n1):
            return n1
        n1 += seq_shards
    raise ValueError(f"no four-step plan for n={n}, shards={seq_shards}")


def sp_plan_strided(n: int, seq_shards: int) -> int:
    """N1 for the strided (2-all-to-all) layout: both transposes shard, so
    the shard count must divide BOTH factors; prefer balanced factors."""
    s = seq_shards
    best = None
    n1 = s
    while n1 * s <= n:
        if (n % n1 == 0 and (n // n1) % s == 0
                and cfft_factors(n1) and cfft_factors(n // n1)):
            if best is None or abs(math.log(n1 * n1 / n)) < abs(
                    math.log(best * best / n)):
                best = n1
        n1 += s
    if best is None:
        raise ValueError(
            f"no strided four-step plan for n={n}, shards={s} "
            f"(needs s | N1 and s | N2)")
    return best


def sp_stride_permute(x: jnp.ndarray, n1: int, n2: int,
                      inverse: bool = False, axis: int = -2) -> jnp.ndarray:
    """Natural <-> strided sequence layout for the 2-all-to-all SP path.

    Strided position p = b*n1 + a holds natural index t = a*n2 + b: a
    contiguous shard of the strided layout owns one residue class of the
    four-step's minor index b, which makes BOTH outer DFT stages shard-local
    (see ``sp_spectral_mix_strided``).  Pure reshape+transpose; under a
    sequence-sharded input GSPMD lowers it to one all-to-all.
    """
    axis = axis % x.ndim
    lead, n, tail = x.shape[:axis], x.shape[axis], x.shape[axis + 1:]
    assert n == n1 * n2, (n, n1, n2)
    if inverse:
        xr = x.reshape(*lead, n2, n1, *tail)
        xr = jnp.swapaxes(xr, axis, axis + 1)
    else:
        xr = x.reshape(*lead, n1, n2, *tail)
        xr = jnp.swapaxes(xr, axis, axis + 1)
    return xr.reshape(*lead, n, *tail)


def sp_spectral_mix_strided(
    v: jnp.ndarray,                 # (B, N, d) real, STRIDED layout, 'seq'
    gate_half: jnp.ndarray,         # (B, F_half, d) complex, replicated
    memory_fft: Optional[jnp.ndarray],   # (F_half, d) complex or None
    *,
    n_fft: int,
    mesh: Mesh,
    seq_axis: str = "seq",
) -> jnp.ndarray:
    """The OPTIMAL sequence-parallel mix: exactly 2 all-to-alls.

    ``v`` arrives in the strided layout (``sp_stride_permute``): sharding
    the strided positions contiguously shards the four-step's minor index
    b, so stage 1 (DFT over the major index a) is already shard-local and
    the inverse lands shard-local too.  Only the mid-transform transposes
    (b-sharded <-> c-sharded) move data.  Output is strided again, so
    layout-indifferent model ops (linears, LN, mean/attention pooling,
    residuals) chain layers with NO extra collectives; only embedding and
    loss need the one-time index remap.
    """
    b, n, d = v.shape
    assert n == n_fft, "SP mix operates on the full window (N == n_fft)"
    s = mesh.shape[seq_axis]
    n1 = sp_plan_strided(n_fft, s)
    n2 = n_fft // n1
    f1 = tuple(cfft_factors(n1))
    f2 = tuple(cfft_factors(n2))

    def cst(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    # Every stage output is PINNED to its shard-local sharding: with the
    # transitions left to propagation, GSPMD's cost model degrades the two
    # axis-swap reshards into all-gathers around the DFT einsums (verified
    # on the 8-device mesh); pinned, the compiled module contains exactly
    # 2 all-to-alls and 0 all-gathers (asserted in tests/test_dist_fft.py).
    b_sh = P(None, seq_axis, None, None)
    c_sh = P(None, None, seq_axis, None)

    # layout (bb, a): zs[bb, a] = v_natural[a*n2 + bb]; shards own bb rows
    z = v.astype(jnp.float32).reshape(b, n2, n1, d)
    z = jax.lax.complex(z, jnp.zeros_like(z))
    z = cst(z, b_sh)                                     # no-op: b-sharded
    z = cst(_cfft(z, f1, sign=-1), b_sh)                 # DFT over a -> c
    z = z * jnp.asarray(_twiddle2_np(n1, n2, -1)).T[None, :, :, None]
    z = cst(z, b_sh)
    z = cst(z, c_sh)                                     # a2a #1: c-sharded
    z = cst(_cfft_axis1(z, f2, sign=-1), c_sh)           # DFT over bb -> kq
    # spectrum S[kq, c] = X[c + n1*kq], sharded over c.

    gate2 = _full_gate(jnp.moveaxis(gate_half, -2, -1), n_fft, n1)
    gate2 = jnp.transpose(gate2, (0, 3, 2, 1))           # (B, kq, c, d)
    gate2 = cst(gate2, c_sh)
    z = z * gate2
    if memory_fft is not None:
        mem2 = _full_gate(jnp.moveaxis(memory_fft, -2, -1), n_fft, n1)
        mem2 = jnp.transpose(mem2, (2, 1, 0))            # (kq, c, d)
        z = z + cst(mem2[None], c_sh)

    # inverse (mirror)
    z = cst(_cfft_axis1(z, f2, sign=+1) / n2, c_sh)      # kq -> bb
    z = z * jnp.asarray(_twiddle2_np(n1, n2, +1)).T[None, :, :, None]
    z = cst(z, c_sh)
    z = cst(z, b_sh)                                     # a2a #2: b-sharded
    z = _cfft(z, f1, sign=+1) / n1                       # c -> a
    y = jnp.real(z).reshape(b, n_fft, d)                 # strided layout
    return cst(y, P(None, seq_axis, None))


def sp_spectral_mix(
    v: jnp.ndarray,                 # (B, N, d) real, sequence-sharded 'seq'
    gate_half: jnp.ndarray,         # (B, F_half, d) complex, replicated
    memory_fft: Optional[jnp.ndarray],   # (F_half, d) complex or None
    *,
    n_fft: int,
    mesh: Mesh,
    seq_axis: str = "seq",
) -> jnp.ndarray:
    """y = irfft(gate_half * rfft(v) [+ memory]) with the sequence axis
    sharded over ``mesh[seq_axis]``.  Matches the single-device layer math
    (including the irfft DC/Nyquist convention) to fp32 accuracy."""
    b, n, d = v.shape
    assert n == n_fft, "SP mix operates on the full window (N == n_fft)"
    s = mesh.shape[seq_axis]
    n1 = sp_plan(n_fft, s)
    n2 = n_fft // n1
    f1 = tuple(cfft_factors(n1))
    f2 = tuple(cfft_factors(n2))

    def cst(x, spec):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    # Stage structure mirrors matfft._cfft exactly (stage 1 over the MAJOR
    # factor a, twiddle W_n^{c*b}, stage 2 over the minor factor b; output
    # index k = c + n1*kq), so the per-stage math is the already-verified
    # one; only the shardings move.  The sequence arrives contiguous
    # (n1-sharded), so stage 1 needs a reshard first — 4 all-to-alls per
    # mix round trip.  TODO(perf): a strided ("b-sharded") model-wide
    # sequence layout would cancel the outer pair, reaching the optimal 2.
    z = v.astype(jnp.float32)
    z = z.reshape(b, n1, n2, d)                          # n = a*n2 + b
    z = jax.lax.complex(z, jnp.zeros_like(z))
    z = cst(z, P(None, seq_axis, None, None))            # arrives a-sharded
    z = cst(z, P(None, None, seq_axis, None))            # a2a: b-sharded
    z = cst(_cfft_axis1(z, f1, sign=-1),
            P(None, None, seq_axis, None))               # DFT over a -> c
    z = z * jnp.asarray(_twiddle2_np(n1, n2, -1))[None, :, :, None]
    z = cst(z, P(None, None, seq_axis, None))
    z = cst(z, P(None, seq_axis, None, None))            # a2a: c-sharded
    z = cst(_cfft_axis2(z, f2, sign=-1),
            P(None, seq_axis, None, None))               # DFT over b -> kq
    # spectrum S[c, kq] = X[c + n1*kq], sharded over c.

    gate2 = _full_gate(jnp.moveaxis(gate_half, -2, -1), n_fft, n1)
    gate2 = jnp.moveaxis(gate2, (-3, -2, -1), (-1, -3, -2))  # (B, n1, n2, d)
    gate2 = cst(gate2, P(None, seq_axis, None, None))
    z = z * gate2
    if memory_fft is not None:
        mem2 = _full_gate(jnp.moveaxis(memory_fft, -2, -1), n_fft, n1)
        mem2 = jnp.moveaxis(mem2, (-3, -2, -1), (-1, -3, -2))  # (n1, n2, d)
        z = z + cst(mem2[None], P(None, seq_axis, None, None))

    # inverse (mirror)
    z = cst(_cfft_axis2(z, f2, sign=+1) / n2,
            P(None, seq_axis, None, None))               # kq -> b
    z = z * jnp.asarray(_twiddle2_np(n1, n2, +1))[None, :, :, None]
    z = cst(z, P(None, seq_axis, None, None))
    z = cst(z, P(None, None, seq_axis, None))            # a2a: b-sharded
    z = cst(_cfft_axis1(z, f1, sign=+1) / n1,
            P(None, None, seq_axis, None))               # c -> a
    y = jnp.real(z).reshape(b, n_fft, d)
    return cst(y, P(None, seq_axis, None))


def _cfft_axis2(z: jnp.ndarray, factors, sign: int) -> jnp.ndarray:
    """DFT along axis -2 of (B, n1, n2, d) — matfft transforms axis -2."""
    return _cfft(z, tuple(factors), sign)


def _cfft_axis1(z: jnp.ndarray, factors, sign: int) -> jnp.ndarray:
    """DFT along axis 1 of (B, n1, n2, d): fold n2 into the batch by a
    transpose-free reshape trick — einsum directly over axis 1."""
    zt = jnp.swapaxes(z, 1, 2)                           # (B, n2, n1, d)
    zt = _cfft(zt, tuple(factors), sign)
    return jnp.swapaxes(zt, 1, 2)
