"""Real-shape CP/SP validation of the 1B hybrid OOM answer.

RESULTS.md records that the 1B hybrid config OOMs ONE chip at seq 16384 by
~1.1 GB and says "that shape is exactly what the CP/SP meshes are for".
Every other sharding test runs toy dims; this one executes a hybrid CP
train step at the REAL dims the claim points to — d_model=2048, seq=16384,
SWA window=1024, causal_chunk=1024 — on the 8-fake-device mesh, with the
layer count cut to one (SPECTRE + SWA) group and a small vocab so a single
host CPU can run it (params scale per-layer; the sharding/layout hazards
live in the d x seq activation geometry, which is kept intact).

Heavy (several minutes of single-core XLA CPU): gated behind
FFT_TPU_HEAVY=1 so the regular suite stays fast.  Run:
    FFT_TPU_HEAVY=1 python -m pytest tests/test_realshape_1b.py -q
The round's executed result is recorded in benchmarks/RESULTS.md.
"""

import os
import re

import numpy as np
import pytest

if not os.environ.get("FFT_TPU_HEAVY"):
    pytest.skip("real-shape 1B CP step is heavy; set FFT_TPU_HEAVY=1",
                allow_module_level=True)

import jax
import jax.numpy as jnp

from fft_tpu.config import SpectreConfig
from fft_tpu.models.hybrid import HybridConfig, hybrid_init
from fft_tpu.parallel import make_mesh
from fft_tpu.train import TrainConfig, hybrid_train_step, train_init

SEQ, D, WINDOW, CHUNK = 16384, 2048, 1024, 1024


def test_hybrid_cp_train_step_at_1b_shapes():
    cp_mesh = make_mesh(data=1, seq=8, model=1)
    cfg = HybridConfig(
        vocab_size=1024,                    # embed table is not the claim
        num_groups=1, spectre_per_group=1,  # one (SPECTRE + SWA) group
        block=SpectreConfig(
            embed_dim=D, num_heads=16, n_fft=SEQ, pooling_type="mean",
            wavelet_on_rate=0.0, causal=True, causal_chunk=CHUNK,
            causal_impl="segmented",        # the shard-local CP algorithm
            fft_impl="matmul"),             # CPU FFT thunk rejects sharded
        attn_heads=16, attn_window=WINDOW, max_seq=SEQ, remat=True)
    params = hybrid_init(jax.random.key(0), cfg)
    tcfg = TrainConfig(learning_rate=1e-4, warmup_steps=2, total_steps=10)
    state, opt = train_init(jax.random.key(1), params, tcfg)
    batch = jax.random.randint(jax.random.key(2), (1, SEQ + 1), 0,
                               cfg.vocab_size, jnp.int32)

    step = jax.jit(lambda s, b: hybrid_train_step(
        s, b, model_cfg=cfg, optimizer=opt, cp_mesh=cp_mesh))
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    txt = compiled.as_text()
    # The SWA halo exchange must ride collective-permute over 'seq', and
    # the sequence-sharded stack needs at least one reshard collective.
    assert re.search(r"collective-permute", txt), "no halo exchange in HLO"
    assert ("all-to-all" in txt or "all-gather" in txt
            or "reduce-scatter" in txt or "all-reduce" in txt), \
        "no seq collectives in HLO"

    _, metrics = compiled(state, batch)
    loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss), loss
