"""Device mesh construction and sharding rules.

Axes:
- ``data``  — batch (DP).
- ``seq``   — sequence/context (SP/CP; distributed FFT all-to-alls ride
  this axis — see fft_tpu.parallel.dist_fft).
- ``model`` — tensor parallel.  SPECTRE heads have fully independent
  parameters and only concat at out_proj (spectre.py:703-718), so TP shards
  the stacked head axis — the natural boundary SURVEY §2.4 identifies:
  head-parallel compute needs NO collectives until the out_proj
  reduce-scatter, which GSPMD inserts from these annotations.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, seq: int = 1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    n = data * seq * model
    devices = list(devices if devices is not None else jax.devices())[:n]
    assert len(devices) == n, (len(devices), n)
    arr = np.asarray(devices).reshape(data, seq, model)
    return Mesh(arr, ("data", "seq", "model"))


def _spec_for(keys, nd: int) -> P:
    """Sharding rule from the path's key names (works for params and for
    optimizer moments, whose paths mirror the param tree):

    - heads.*            (L, H, ...)  -> head axis on 'model'
    - mix.out_proj.w     (L, d, d)    -> input (concat-heads) dim on 'model'
    - mlp.fc1.w          (L, d, 4d)   -> output dim on 'model'
    - mlp.fc2.w          (L, 4d, d)   -> input dim on 'model'
    - tok_emb            (V, d)       -> vocab on 'model'
    - everything else replicated
    """
    if nd == 0:
        return P()
    if "heads" in keys and nd >= 2:
        return P(None, "model", *([None] * (nd - 2)))
    if "out_proj" in keys and nd == 3:
        return P(None, "model", None)
    if "mlp" in keys and "fc1" in keys and keys[-1] == "w" and nd == 3:
        return P(None, None, "model")
    if "mlp" in keys and "fc2" in keys and keys[-1] == "w" and nd == 3:
        return P(None, "model", None)
    if "tok_emb" in keys and nd == 2:
        return P("model", None)
    return P(*([None] * nd))


def _path_keys(path) -> list:
    out = []
    for p in path:
        k = getattr(p, "key", None)
        if k is None:
            k = getattr(p, "name", None)
        out.append(str(k) if k is not None else "")
    return out


def shardings_for_tree(mesh: Mesh, tree):
    """NamedSharding pytree for any tree whose paths contain param-style key
    names (params, TrainState incl. optimizer moments)."""
    def one(path, leaf):
        nd = getattr(leaf, "ndim", 0)
        return NamedSharding(mesh, _spec_for(_path_keys(path), nd))
    return jax.tree_util.tree_map_with_path(one, tree)


def lm_param_shardings(mesh: Mesh, params):
    return shardings_for_tree(mesh, params)


def lm_state_shardings(mesh: Mesh, state):
    return shardings_for_tree(mesh, state)


def lm_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Token batches (B, N): batch over 'data' (sequence stays unsharded at
    the jit boundary; SP is applied inside via sharding constraints)."""
    return NamedSharding(mesh, P("data", None))
