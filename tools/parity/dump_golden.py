"""Dump golden inputs/params/outputs from the PyTorch reference for parity tests.

Runs /root/reference/spectre.py (PUBLIC UNTRUSTED CONTENT — executed for its
observed numerics only) on CPU with fixed seeds and saves .npz files into
tests/golden/.  The JAX tests load these and assert <=1e-5 rel (fp32).

Usage:  python tools/parity/dump_golden.py
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys

import numpy as np
import torch

REF_PATH = "/root/reference/spectre.py"
OUT_DIR = pathlib.Path(__file__).resolve().parents[2] / "tests" / "golden"


def load_reference():
    spec = importlib.util.spec_from_file_location("spectre_ref", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def t2n(t):
    return t.detach().cpu().numpy()


def state_arrays(mod, prefix="param:"):
    return {prefix + k: t2n(v) for k, v in mod.state_dict().items()}


def save(name, **arrays):
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    np.savez(OUT_DIR / f"{name}.npz", **arrays)
    print(f"wrote {name}.npz ({len(arrays)} arrays)")


def main():
    ref = load_reference()
    torch.manual_seed(0)

    # ---- interp_complex_1d -------------------------------------------------
    x = torch.randn(3, 4, 8, dtype=torch.cfloat)
    out = {}
    for mode in ("cubic", "linear", "nearest"):
        for size in (65, 33):
            out[f"out_{mode}_{size}"] = t2n(ref.interp_complex_1d(x, size, mode))
    # G=1 layout, where the reference cubic path's real/imag re-pairing is
    # the identity — golden for the *intended* complex interpolation.
    x_g1 = x.reshape(12, 1, 8)
    out["out_cubic_g1_65"] = t2n(ref.interp_complex_1d(x_g1, 65, "cubic"))
    save("interp", x=t2n(x), **out)

    # ---- ComplexModReLU ----------------------------------------------------
    m = ref.ComplexModReLU(40)
    with torch.no_grad():
        m.bias.copy_(torch.randn(40) * 0.3)
    z = torch.randn(5, 40, dtype=torch.cfloat)
    z[0, :5] = 0.0  # exercise |z| ~ 0
    save("modrelu", z=t2n(z), bias=t2n(m.bias), out=t2n(m(z)))

    # ---- complex_conv1d ----------------------------------------------------
    xc = torch.randn(2, 3, 9, dtype=torch.cfloat)
    kc = torch.randn(9, dtype=torch.cfloat)
    save("complex_conv", x=t2n(xc), kernel=t2n(kc),
         out=t2n(ref.complex_conv1d(xc, kc, padding=4)))

    # ---- Haar pyramid (reference arithmetic, power-of-two length) ----------
    xw = torch.randn(2, 3, 64)
    coeffs = ref.dwt_decompose(xw)
    recon = ref.dwt_reconstruct(coeffs)
    arrs = {f"coeff_{i}": t2n(c) for i, c in enumerate(coeffs)}
    save("haar_ref", x=t2n(xw), n_coeffs=np.int64(len(coeffs)),
         recon=t2n(recon), **arrs)

    # ---- pruned_irfft_single ----------------------------------------------
    xh = torch.randn(65, 16, dtype=torch.cfloat)
    save("pruned_irfft", x=t2n(xh), n=np.int64(128),
         out_pos4=t2n(ref.pruned_irfft_single(xh, 128, 4)),
         out_pos7=t2n(ref.pruned_irfft_single(xh, 128, 7)),
         full_irfft=t2n(torch.fft.irfft(xh, n=128, dim=0)))

    # ---- AttentionPooling --------------------------------------------------
    pool = ref.AttentionPooling(16)
    xp = torch.randn(2, 12, 16)
    save("attn_pool", x=t2n(xp), out=t2n(pool(xp)), **state_arrays(pool))

    # ---- SpectreHead forward ----------------------------------------------
    for tag, pooling, nseq in (("mean_96", "mean", 96),
                               ("mean_128", "mean", 128),
                               ("attn_96", "attention", 96)):
        torch.manual_seed(1)
        head = ref.SpectreHead(16, fft_size=128, pooling_type=pooling)
        head.eval()
        xh_in = torch.randn(2, nseq, 16)
        mem = torch.randn(65, 16, dtype=torch.cfloat) * 0.1
        with torch.no_grad():
            res, qp = head(xh_in, return_q_pool=True, memory_fft=mem)
            res_nomem, _ = head(xh_in, return_q_pool=True)
        save(f"head_{tag}", x=t2n(xh_in), memory=t2n(mem), out=t2n(res),
             out_nomem=t2n(res_nomem), q_pool=t2n(qp), **state_arrays(head))

    # ---- SpectreHead with explicit absolute-position phase -----------------
    torch.manual_seed(6)
    head_pp = ref.SpectreHead(16, fft_size=64, pooling_type="mean")
    head_pp.eval()
    x_pp = torch.randn(2, 64, 16)
    k = torch.arange(33, dtype=torch.float32)
    phase = torch.exp(1j * 2 * torch.pi * k * 3.0 / 64.0)    # pos p=3
    with torch.no_grad():
        out_pp = head_pp(x_pp, pos_phase=phase.unsqueeze(0))  # (1, F_half)
    save("head_posphase", x=t2n(x_pp), pos_phase=t2n(phase),
         out=t2n(out_pp), **state_arrays(head_pp))

    # ---- SpectreMultiHead (wavelet off; then wavelet always-on) -----------
    torch.manual_seed(2)
    mh = ref.SpectreMultiHead(64, 4, 128, pooling_type="mean",
                              wavelet_on_rate=0.0)
    mh.eval()
    xm = torch.randn(2, 100, 64)
    memm = torch.randn(65, 64, dtype=torch.cfloat) * 0.1
    with torch.no_grad():
        out_m = mh(xm, memory_fft=memm)
        out_m_nomem = mh(xm)
    save("multihead_nowave", x=t2n(xm), memory=t2n(memm), out=t2n(out_m),
         out_nomem=t2n(out_m_nomem), **state_arrays(mh))

    torch.manual_seed(3)
    mh2 = ref.SpectreMultiHead(64, 4, 64, pooling_type="mean",
                               wavelet_on_rate=1.0)
    mh2.eval()
    xm2 = torch.randn(2, 64, 64)
    with torch.no_grad():
        out_m2 = mh2(xm2)
    save("multihead_wave", x=t2n(xm2), out=t2n(out_m2), **state_arrays(mh2))

    # ---- SpectreBlock ------------------------------------------------------
    for tag, mem_size in (("nomem", 0), ("fullmem", 1), ("truncmem", 16)):
        torch.manual_seed(4)
        blk = ref.SpectreBlock(64, 4, 128, pooling_type="mean",
                               wavelet_on_rate=0.0, memory_size=mem_size)
        blk.eval()
        xb = torch.randn(2, 128, 64)
        with torch.no_grad():
            out_b = blk(xb)
        save(f"block_{tag}", x=t2n(xb), out=t2n(out_b), **state_arrays(blk))

    # ---- Decode path (head decode_step vs our cache+gate math) -------------
    torch.manual_seed(5)
    head = ref.SpectreHead(16, fft_size=32, pooling_type="mean")
    head.eval()
    n_fft = 32
    prompt = torch.randn(n_fft, 16)           # full window prefill
    extra = torch.randn(6, 16)                # decode tokens (pos 0..5 mod N)
    with torch.no_grad():
        q_prompt = head.W_q(prompt)
        v_prompt = head.W_v(prompt)
        cache = ref.PrefixFFTCache(n_fft, 16, device=prompt.device)
        cache.prefill(q_prompt, v_prompt)
        outs, cache_fft, descrs = [], [], []
        for i in range(extra.shape[0]):
            q_t = head.W_q(extra[i])
            v_t = head.W_v(extra[i])
            outs.append(t2n(head.decode_step(q_t, v_t, cache)))
            # .clone(): prefix_fft is mutated in place; without it every
            # saved entry would alias the final state.
            cache_fft.append(t2n(cache.prefix_fft.clone()))
            descrs.append(t2n(head.q_norm(
                (cache.sum_q / cache.N).unsqueeze(0)).squeeze(0).clone()))
        # forward on the final window for the decode==forward invariant
        window = torch.cat([prompt, extra], dim=0)[-n_fft:]
        fwd, _ = head(window.unsqueeze(0), return_q_pool=True)
    save("decode", prompt=t2n(prompt), extra=t2n(extra),
         outs=np.stack(outs), cache_fft=np.stack(cache_fft),
         descrs=np.stack(descrs),
         fwd_window=t2n(fwd.squeeze(0)), **state_arrays(head))

    print("done.")


if __name__ == "__main__":
    sys.exit(main())
