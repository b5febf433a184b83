"""Image-folder data pipeline (train/images.py): decode, preprocessing
contract, determinism, CLI integration."""

import json
import subprocess
import sys

import numpy as np
import pytest

from fft_tpu.train.images import ImageFolderDataset, synthetic_image_batches

PIL = pytest.importorskip("PIL.Image")


def _make_dataset(root, classes=("cat", "dog"), per_class=3, size=40):
    rng = np.random.default_rng(0)
    for label, cls in enumerate(classes):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(per_class):
            # rectangular (taller than wide) so resize/crop paths both run
            arr = rng.integers(0, 255, (size + 13, size, 3)).astype("uint8")
            arr[:, :, 0] = 40 * label          # class-correlated channel
            PIL.fromarray(arr).save(d / f"img_{i}.png")
    return root


def test_image_folder_batches(tmp_path):
    ds = ImageFolderDataset(_make_dataset(tmp_path / "data"), image_size=32)
    assert ds.classes == ["cat", "dog"]
    assert ds.num_classes == 2 and len(ds) == 6
    it = ds.batches(batch=4, seed=0)
    imgs, labels = next(it)
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.float32
    assert labels.shape == (4,) and labels.dtype == np.int32
    assert set(labels) <= {0, 1}
    # normalized: roughly centered, not constant
    assert abs(float(imgs.mean())) < 3.0 and float(imgs.std()) > 0.05


def test_image_batches_deterministic(tmp_path):
    root = _make_dataset(tmp_path / "data")
    a = ImageFolderDataset(root, image_size=32).batches(4, seed=7)
    b = ImageFolderDataset(root, image_size=32).batches(4, seed=7)
    for _ in range(3):
        ia, la = next(a)
        ib, lb = next(b)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_allclose(ia, ib)


def test_eval_center_crop_stable(tmp_path):
    ds = ImageFolderDataset(_make_dataset(tmp_path / "data"), image_size=32)
    e1, e2 = ds.example(0), ds.example(0)
    np.testing.assert_allclose(e1, e2)            # no randomness w/o rng


def test_empty_root_raises(tmp_path):
    (tmp_path / "noclasses").mkdir()
    with pytest.raises(ValueError):
        ImageFolderDataset(tmp_path / "noclasses")


def test_synthetic_batches_learnable():
    it = synthetic_image_batches(8, 32, num_classes=4, seed=0)
    imgs, labels = next(it)
    assert imgs.shape == (8, 32, 32, 3) and labels.shape == (8,)
    # same-class images are correlated (class-conditional prototypes)
    idx = {int(l): i for i, l in enumerate(labels)}
    if len(idx) >= 2:
        a, b = list(idx.values())[:2]
        assert not np.allclose(imgs[a], imgs[b])


def test_cli_train_vit_on_image_folder(tmp_path):
    """train-vit --data consumes a real image folder end-to-end."""
    root = _make_dataset(tmp_path / "data", per_class=4)
    metrics = tmp_path / "m.jsonl"
    env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin"}
    r = subprocess.run(
        [sys.executable, "-m", "fft_tpu.cli", "train-vit", "--steps", "2",
         "--batch", "4", "--data", str(root), "--layers", "1",
         "--metrics", str(metrics), "--log-every", "1"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert lines and np.isfinite(lines[-1]["loss"])
