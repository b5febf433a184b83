"""SPECTRE-350M training step time at long context on one chip.

Config 4 (BASELINE): 24-layer d=1024 causal LM.  bf16 compute + remat +
chunked cross-entropy; batch 1 at seq 16384.  Reports s/step via the
slope method (two chained step counts, one transfer).

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bench_350m.py [--seq N]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fft_tpu.models.lm import lm_init, spectre_350m_config
from fft_tpu.train.loop import train_step, TrainState


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--vocab", type=int, default=50432)
    args = ap.parse_args()

    cfg = spectre_350m_config(vocab_size=args.vocab, seq=args.seq)
    cfg = dataclasses.replace(
        cfg, block=dataclasses.replace(cfg.block, compute_dtype="bfloat16"))
    params = lm_init(jax.random.key(0), cfg)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    opt = optax.adamw(1e-4)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(0, jnp.int32),
                       rng=jax.random.key_data(jax.random.key(2)))
    batch = jax.random.randint(jax.random.key(1),
                               (args.batch, args.seq + 1), 0, args.vocab)

    def chain(st, bt, k):
        def body(s, _):
            s, metrics = train_step(s, bt, model_cfg=cfg, optimizer=opt)
            return s, metrics["loss"]
        s, losses = jax.lax.scan(body, st, None, length=k)
        return s, losses[-1]

    k_lo, k_hi = 1, 3
    # donate the train state: without it XLA double-buffers params +
    # AdamW mu/nu (~2.1 GB at 350M f32) as HLO-temp copies — the seq-32k
    # config only fits HBM with in-place updates.  The returned state is
    # threaded through every call (the donated input is dead after it).
    f_lo = jax.jit(lambda st, bt: chain(st, bt, k_lo), donate_argnums=(0,))
    f_hi = jax.jit(lambda st, bt: chain(st, bt, k_hi), donate_argnums=(0,))
    state, l0 = f_lo(state, batch)
    float(np.asarray(l0))
    state, l0 = f_hi(state, batch)
    float(np.asarray(l0))

    holder = [state]                     # single live copy (donated)

    def t(f):
        def run():
            st, loss = f(holder.pop(), batch)
            holder.append(st)
            return loss

        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter(); float(np.asarray(run()))
            best = min(best, time.perf_counter() - t0)
        return best

    s = (t(f_hi) - t(f_lo)) / (k_hi - k_lo)
    print(json.dumps({
        "model": "spectre-350m", "params": n_params,
        "seq": args.seq, "batch": args.batch,
        "causal_chunk": cfg.block.causal_chunk,
        "s_per_step": round(s, 3),
        "tok_s": round(args.batch * args.seq / s),
    }), flush=True)


if __name__ == "__main__":
    main()
