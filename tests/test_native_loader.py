"""Native C++ data loader: builds, samples valid/deterministic batches."""

import numpy as np
import pytest

from fft_tpu.train.native_loader import (
    NativeCharLoader, NativeLoaderUnavailable, build,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "corpus.txt"
    rng = np.random.default_rng(0)
    p.write_bytes(bytes(rng.integers(32, 127, 100_000, dtype=np.uint8)))
    return p


def test_build_and_sample(corpus):
    try:
        build()
    except NativeLoaderUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")
    loader = NativeCharLoader(str(corpus), batch=4, seq_len=64, seed=7)
    data = corpus.read_bytes()
    for _ in range(3):
        b = next(loader)
        assert b.shape == (4, 65) and b.dtype == np.int32
        assert b.min() >= 0 and b.max() < 256
        # every row must be a real window of the corpus
        for row in b:
            assert bytes(row.astype(np.uint8)) in data
    loader.close()


def test_deterministic_given_seed(corpus):
    try:
        build()
    except NativeLoaderUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")
    a = next(NativeCharLoader(str(corpus), 2, 16, seed=5))
    b = next(NativeCharLoader(str(corpus), 2, 16, seed=5))
    np.testing.assert_array_equal(a, b)
    c = next(NativeCharLoader(str(corpus), 2, 16, seed=6))
    assert not np.array_equal(a, c)
