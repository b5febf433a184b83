"""Pipeline parallelism: GPipe-style microbatched execution of a homogeneous
block stack over a 'stage' mesh axis (SURVEY §2.4 — PP for the 1B configs).

Mechanics: the scan-stacked layer parameters are sharded on their leading
layer axis across stages (L/P contiguous layers per stage).  Microbatches
flow through a ``shard_map``: each step every stage applies its local layers
and ``ppermute``s the activation to the next stage; after M + P - 1 steps
all M microbatches have drained.  Differentiable end-to-end (the loop is a
``lax.scan``; ppermute has a well-defined transpose), so the same function
trains under jit.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def pipeline_apply(
    block_params,                    # pytree, leaves (L, ...) stacked layers
    apply_block: Callable,           # (single-layer params, h) -> h
    h: jnp.ndarray,                  # (B, N, d) activations entering layer 0
    *,
    mesh: Mesh,
    stage_axis: str = "stage",
    num_microbatches: int = None,
) -> jnp.ndarray:
    """Run the L-layer stack over P pipeline stages.  Returns (B, N, d).

    L must divide evenly into P stages; B into microbatches.  The result is
    replicated across the stage axis (a psum gather at the end — callers
    computing a loss can instead keep it on the last stage).
    """
    num_stages = mesh.shape[stage_axis]
    num_layers = jax.tree.leaves(block_params)[0].shape[0]
    assert num_layers % num_stages == 0, (num_layers, num_stages)
    m = num_microbatches or num_stages
    b = h.shape[0]
    assert b % m == 0, (b, m)
    mb = b // m

    x_mb = h.reshape(m, mb, *h.shape[1:])

    param_specs = jax.tree.map(lambda _: P(stage_axis), block_params)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs, P()),        # params stage-sharded, x replic.
        out_specs=P(),
        check_vma=False)
    def run(local_params, x_mb):
        stage = jax.lax.axis_index(stage_axis)
        perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

        def local_stack(h):
            def body(h, p):
                return apply_block(p, h), None
            h, _ = jax.lax.scan(body, h, local_params)
            return h

        def step(carry, t):
            recv, ys = carry
            mb_idx = jnp.clip(t, 0, m - 1)
            x0 = jax.lax.dynamic_index_in_dim(x_mb, mb_idx, 0,
                                              keepdims=False)
            inp = jnp.where(stage == 0, x0, recv)
            out = local_stack(inp)
            recv_new = jax.lax.ppermute(out, stage_axis, perm)
            write_idx = jnp.clip(t - (num_stages - 1), 0, m - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                ys, out.astype(ys.dtype), write_idx, 0)
            ys = jnp.where(t >= num_stages - 1, upd, ys)
            return (recv_new, ys), None

        ys0 = jnp.zeros_like(x_mb)
        recv0 = jnp.zeros_like(x_mb[0])
        (recv, ys), _ = jax.lax.scan(
            step, (recv0, ys0), jnp.arange(m + num_stages - 1))
        # only the last stage's collected outputs are real; broadcast them
        is_last = (stage == num_stages - 1).astype(ys.dtype)
        return jax.lax.psum(ys * is_last, stage_axis)

    out = run(block_params, x_mb)
    return out.reshape(b, *h.shape[1:])
