"""Full-model SPECTRE-350M generation benchmark at n_fft 16k.

The decode story the paper leads with (reference decode path
`/root/reference/spectre.py:562-611` is per-head, batch-1, layer-less;
this is the framework's batched, multi-layer version): prefill a 16k-token
prompt through all 24 layers, then steady-state O(F·d)-per-token decode.

Reports prefill seconds and steady-state ms/token + tokens/s.  Steady
state is slope-timed (chained scan at two depths, one transfer — see
bench.py for why per-call walls lie on this relay).  The decode step is
bandwidth-bound on prefix-FFT state traffic: each token reads+writes the
(F, d) spectrum per layer => ~2 * 2*8193*1024*4B * 24 ≈ 3.2 GB/token of
HBM, a ~4 ms floor at v5e's ~819 GB/s — the printed ratio says how close
the XLA-fused update runs.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/bench_350m_decode.py
         [--seq 16384] [--batch 1] [--bf16]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fft_tpu.models.lm import (_prefill_split_fns, lm_head_matrix,
                               spectre_350m_config)


def decode_chain_flat(params, cfg, caches, logits0, pos0, k):
    """k decode steps as ONE flat scan over k * num_layers LAYER-steps.

    Math-identical to chaining ``lm_decode_step`` (asserted by
    tests/test_decode.py::test_decode_chain_flat_matches_lm_decode_step),
    but the scan body is a SINGLE layer with the layer's params/cache
    gathered by dynamic indexing: the 24-layer nested-scan module exceeded
    the relay's remote-compile window twice ('Broken pipe' after ~25 min),
    while this body compiles in minutes.  Token boundaries (embed at layer
    0, LM head at layer L-1) run under lax.cond so the head matmul costs
    nothing on interior layer-steps.  Returns a 1-element logits slice.
    """
    import jax
    from fft_tpu.layers.common import layernorm_apply
    from fft_tpu.decode.cache import spectre_block_decode_step

    L = cfg.num_layers
    blocks = params["blocks"]
    head = lm_head_matrix(params, cfg)
    b = logits0.shape[0]
    d = cfg.embed_dim
    h0 = jnp.zeros((b, d), params["tok_emb"].dtype)

    def body(carry, i):
        caches, logits, h, pos = carry
        layer = jnp.mod(i, L)

        h = jax.lax.cond(
            layer == 0,
            lambda: (params["tok_emb"][jnp.argmax(logits, -1)
                                       .astype(jnp.int32)]
                     + params["pos_emb"][pos]).astype(h.dtype),
            lambda: h)
        bp = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, layer, 0,
                                                   keepdims=False), blocks)
        cl = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(x, layer, 0,
                                                   keepdims=False), caches)
        h, cl = spectre_block_decode_step(bp, cfg.block, h, cl)
        caches = jax.tree.map(
            lambda c, u: jax.lax.dynamic_update_index_in_dim(c, u, layer,
                                                             0),
            caches, cl)
        logits, pos = jax.lax.cond(
            layer == L - 1,
            lambda: ((layernorm_apply(params["ln_f"], h)
                      @ head.astype(h.dtype)).astype(logits.dtype),
                     pos + 1),
            lambda: (logits, pos))
        return (caches, logits, h, pos), None

    (caches, logits, _, _), _ = jax.lax.scan(
        body, (caches, logits0, h0, jnp.asarray(pos0, jnp.int32)),
        jnp.arange(k * L))
    return logits[0]    # one vocab row: small transfer, full parity check


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--f32", dest="bf16", action="store_false")
    ap.add_argument("--k", type=int, default=48,
                    help="deep-chain decode depth (slope upper point)")
    ap.add_argument("--hbm-gbps", type=float, default=0.0,
                    help="HBM bandwidth for the floor; 0 = measure on chip")
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (CPU smoke runs); 0 = 24")
    args = ap.parse_args()

    import dataclasses
    cfg = spectre_350m_config(seq=args.seq)
    if args.layers:
        cfg = dataclasses.replace(cfg, num_layers=args.layers)
    if args.bf16:
        cfg = dataclasses.replace(
            cfg, block=dataclasses.replace(cfg.block,
                                           compute_dtype="bfloat16"))
    from fft_tpu.models.lm import lm_init
    params = lm_init(jax.random.key(0), cfg)
    prompt = jax.random.randint(jax.random.key(1), (args.batch, args.seq - 64),
                                0, cfg.vocab_size, jnp.int32)

    # ---- prefill: direct best-of-3 walls on the SPLIT path (two modules:
    # 24-layer forward, then cache build — one module broke the relay's
    # remote_compile twice at this size; see lm_prefill_split).  Prefill
    # at 16k is ~1 s, so the ~30-40 ms relay RTT is a <5% error — not
    # worth the chained-scan slope graphs, which take >25 min to compile
    # through the relay at this model size.  CRITICAL on this relay: force
    # ONLY small leaves to host — the caches are GBs and
    # block_until_ready doesn't block, so a pytree transfer would time
    # the HTTP tunnel, not the chip. ----
    p_fwd, p_caches = _prefill_split_fns(cfg)

    def timed(f, *a, get=lambda r: r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(get(f(*a)))
            best = min(best, time.perf_counter() - t0)
        return best

    print("compiling prefill fwd...", flush=True)
    _, hs = p_fwd(params, prompt)
    np.asarray(_[0])                                # compile + warm
    print("compiling cache build...", flush=True)
    np.asarray(p_caches(params, hs).t)              # compile + warm
    prefill_s = (timed(p_fwd, params, prompt, get=lambda r: r[0][0])
                 + timed(p_caches, params, hs, get=lambda r: r.t))

    # ---- steady-state decode ----
    logits, hs = p_fwd(params, prompt)
    caches = p_caches(params, hs)
    np.asarray(logits)                              # fence before timing
    pos0 = prompt.shape[1]

    # params MUST be an argument, not a closure: jit embeds closed-over
    # arrays as module constants, and a ~700 MB serialized module is what
    # actually broke the relay's remote_compile POST ("Broken pipe") —
    # the prefill jits, which take params explicitly, compiled fine.
    k_lo, k_hi = args.k // 6, args.k
    d_lo = jax.jit(lambda p, c, l: decode_chain_flat(p, cfg, c, l,
                                                     pos0, k_lo))
    d_hi = jax.jit(lambda p, c, l: decode_chain_flat(p, cfg, c, l,
                                                     pos0, k_hi))
    print("compiling decode chains...", flush=True)
    np.asarray(d_lo(params, caches, logits))        # compile + warm
    print("decode chain lo compiled", flush=True)
    np.asarray(d_hi(params, caches, logits))
    print("decode chain hi compiled", flush=True)
    tok_s = (timed(d_hi, params, caches, logits)
             - timed(d_lo, params, caches, logits)) / (k_hi - k_lo)

    hbm_gbps = args.hbm_gbps
    if not hbm_gbps:
        from fft_tpu.utils.prof import measure_chip_constants
        hbm_gbps = measure_chip_constants().hbm_gbps   # measured, not nominal

    f_half = args.seq // 2 + 1
    state_gb = (2 * 2 * f_half * cfg.embed_dim * 4 * cfg.num_layers
                * args.batch) / 1e9
    floor_ms = state_gb / hbm_gbps * 1e3
    print(json.dumps({
        "model": "spectre_350m", "seq": args.seq, "batch": args.batch,
        "dtype": "bf16" if args.bf16 else "f32",
        "prefill_s": round(prefill_s, 3),
        "prefill_tok_s": round(args.batch * prompt.shape[1] / prefill_s),
        "decode_ms_per_tok": round(tok_s * 1e3, 3),
        "decode_tok_s": round(args.batch / tok_s, 1),
        "hbm_gbps": round(hbm_gbps, 1),
        "hbm_floor_ms_per_tok": round(floor_ms, 3),
        "pct_of_bandwidth_bound": round(100 * floor_ms / (tok_s * 1e3), 1),
    }))


if __name__ == "__main__":
    main()
