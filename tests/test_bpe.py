"""Byte-level BPE tokenizer + 50k-vocab data path (train/bpe.py).

The reference has no tokenizer or data pipeline (SURVEY §2.4); these pin
the framework-added path: lossless byte-fallback encode/decode,
deterministic training, the uint16 corpus format, the native C++ loader's
elem_size=2 mode, and the CLI end-to-end (tokenize -> train-lm on tokens).
"""

import json

import numpy as np
import pytest

from fft_tpu.train.bpe import (Tokenizer, is_token_file, tokenize_file,
                               train_bpe, vocab_sidecar)
from fft_tpu.train.data import TokenDataset, synthetic_corpus

TEXT = synthetic_corpus(20_000, seed=3) + " unicode: héllo wörld ☃ 12+3=15.\n"


def test_roundtrip_lossless():
    tok = train_bpe(TEXT, vocab_size=512)
    ids = tok.encode(TEXT)
    assert tok.decode(ids) == TEXT
    # byte fallback: text never seen in training still roundtrips
    weird = "Ω≈ç√∫˜µ≤ emoji 🙂 tabs\t\tand\nnewlines"
    assert tok.decode(tok.encode(weird)) == weird


def test_merges_compress_and_stay_in_vocab():
    tok = train_bpe(TEXT, vocab_size=1024)
    ids = tok.encode(TEXT)
    n_bytes = len(TEXT.encode("utf-8"))
    assert len(ids) < 0.6 * n_bytes          # real compression, not identity
    assert len(tok.merges) > 50
    assert 0 <= ids.min() and ids.max() < tok.vocab_size


def test_training_deterministic():
    a = train_bpe(TEXT, vocab_size=600)
    b = train_bpe(TEXT, vocab_size=600)
    assert a.merges == b.merges


def test_small_corpus_saturates_below_target():
    # a 50432 target on a tiny corpus stops early (reserved ids unused)
    tok = train_bpe("ab ab ab cd cd", vocab_size=50432)
    assert tok.vocab_size == 50432
    assert len(tok.merges) < 50


def test_save_load(tmp_path):
    tok = train_bpe(TEXT, vocab_size=512)
    tok.save(tmp_path / "vocab.json")
    tok2 = Tokenizer.load(tmp_path / "vocab.json")
    assert tok2.merges == tok.merges
    np.testing.assert_array_equal(tok2.encode(TEXT[:500]),
                                  tok.encode(TEXT[:500]))


@pytest.fixture(scope="module")
def token_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("bpe") / "corpus.tokens"
    tok = tokenize_file(TEXT, str(out), vocab_size=512)
    return out, tok


def test_token_file_format(token_corpus):
    out, tok = token_corpus
    assert is_token_file(str(out)) and vocab_sidecar(out).exists()
    raw = np.fromfile(out, dtype="<u2")
    assert tok.decode(raw) == TEXT            # stream is the whole corpus


def test_token_dataset_windows(token_corpus):
    out, tok = token_corpus
    ds = TokenDataset(str(out))
    assert ds.vocab_size == 512
    raw = np.fromfile(out, dtype="<u2").astype(np.int32)
    b = next(ds.batches(4, 32, seed=1))
    assert b.shape == (4, 33) and b.dtype == np.int32
    blob = raw.astype("<u2").tobytes()
    for row in b:                             # every row is a real window
        assert row.astype("<u2").tobytes() in blob


def test_native_loader_uint16(token_corpus):
    from fft_tpu.train.native_loader import (NativeCharLoader,
                                             NativeLoaderUnavailable, build)
    out, tok = token_corpus
    try:
        build()
    except NativeLoaderUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")
    loader = NativeCharLoader(str(out), batch=4, seq_len=48, seed=9,
                              elem_size=2)
    blob = out.read_bytes()
    for _ in range(3):
        b = next(loader)
        assert b.shape == (4, 49) and b.max() < 512 and b.min() >= 0
        for row in b:
            window = row.astype("<u2").tobytes()
            i = blob.find(window)
            # present, and at an even (token-aligned) offset
            while i != -1 and i % 2 != 0:
                i = blob.find(window, i + 1)
            assert i != -1
    loader.close()
    # determinism across loaders with the same seed
    a = next(NativeCharLoader(str(out), 2, 16, seed=5, elem_size=2))
    b = next(NativeCharLoader(str(out), 2, 16, seed=5, elem_size=2))
    np.testing.assert_array_equal(a, b)


def test_cli_tokenize_then_train(tmp_path, capsys):
    from fft_tpu.cli import main
    text_path = tmp_path / "corpus.txt"
    text_path.write_text(synthetic_corpus(30_000, seed=7))
    out = tmp_path / "corpus.tokens"
    main(["tokenize", "--data", str(text_path), "--out", str(out),
          "--vocab-size", "512"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["vocab_size"] == 512 and rec["compression"] > 1.5

    # tiny preset on the BPE stream end-to-end (the 350m preset runs the
    # same code path with vocab 50432 — exercised on the real chip)
    main(["train-lm", "--preset", "tiny", "--vocab-size", "512",
          "--data", str(out), "--steps", "2", "--batch", "2",
          "--seq", "256", "--log-every", "1"])
    logs = capsys.readouterr().out
    assert "loss" in logs


def test_cli_train_rejects_oversized_vocab(tmp_path):
    from fft_tpu.cli import main
    out = tmp_path / "big.tokens"
    tokenize_file(TEXT, str(out), vocab_size=512)
    # SystemExit (not assert): user-input validation must survive python -O
    with pytest.raises(SystemExit, match="exceeds model vocab"):
        main(["train-lm", "--preset", "tiny", "--vocab-size", "300",
              "--data", str(out), "--steps", "1", "--batch", "2",
              "--seq", "128"])
