"""Data pipeline tests: toy generation self-consistency, filename parsing,
seeded splits, loader shapes."""
import os

import numpy as np
import pytest

from lie_vae_tpu.data import (
    BatchLoader, ShapeDataset, SphereCubeDataset, Subset, ToyDataset,
    filename_to_quaternion, random_split)
from lie_vae_tpu.data._np_ops import quaternions_to_group_matrix_np


def test_toy_generate_shapes():
    ds = ToyDataset.generate(n=50, degrees=3, rep_copies=4)
    assert len(ds) == 50
    q, h, x = ds[0]
    assert q.shape == (4,)
    assert h.shape == (16, 4)
    assert x.shape == (16, 4)
    # rotation preserves spectrum norm; harmonics normalized to 10
    np.testing.assert_allclose(np.linalg.norm(h), 10.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(ds.x.reshape(50, -1), axis=1), 10.0, rtol=1e-4)


def test_toy_save_load(tmp_path):
    ds = ToyDataset.generate(n=20, degrees=2, rep_copies=3)
    path = os.path.join(tmp_path, "toy.npz")
    ds.save(path)
    ds2 = ToyDataset(path=path)
    np.testing.assert_allclose(ds.x, ds2.x)
    np.testing.assert_allclose(ds.quaternions, ds2.quaternions)


def test_toy_generate_deterministic():
    a = ToyDataset.generate(n=10, degrees=2, rep_copies=3, seed=0)
    b = ToyDataset.generate(n=10, degrees=2, rep_copies=3, seed=0)
    np.testing.assert_allclose(a.x, b.x)


def test_filename_quaternion_parse():
    fn = "000123_0_0.1234_-0.5678_0.9999_-1.0000.png"
    q = filename_to_quaternion(fn)
    assert q == [0.1234, -0.5678, 0.9999, -1.0000]
    with pytest.raises(AssertionError):
        filename_to_quaternion("no_pose_here.png")


def test_shape_dataset_roundtrip(tmp_path):
    # build a tiny synthetic image folder with pose-labelled filenames
    from PIL import Image
    rng = np.random.default_rng(0)
    qs = rng.normal(size=(6, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    d = os.path.join(tmp_path, "imgs")
    os.makedirs(d)
    for i, q in enumerate(qs):
        name = "{:06d}_0_{:.4f}_{:.4f}_{:.4f}_{:.4f}.png".format(i, *q)
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, name))

    class DS(ShapeDataset):
        rgb = True
        single_id = True

    ds = DS(d)
    assert len(ds) == 6
    name, g, img = ds[0]
    assert img.shape == (64, 64, 3)           # NHWC (channel-last)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert g.shape == (3, 3)
    # pose label decodes to the right rotation (note files are sorted)
    expected = quaternions_to_group_matrix_np(
        np.asarray(filename_to_quaternion(sorted(os.listdir(d))[0])))
    np.testing.assert_allclose(g, expected, atol=2e-4)  # 4-decimal filenames


def test_warm_cache_disk_roundtrip(tmp_path, monkeypatch):
    """warm_cache persists the decoded uint8 images and reloads them in
    bulk: a second dataset instance must serve identical pixels with the
    PNG decoder disabled, and a changed file list must NOT hit the stale
    cache."""
    from PIL import Image
    import lie_vae_tpu.data.shapes as shapes_mod
    rng = np.random.default_rng(1)
    qs = rng.normal(size=(5, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    d = os.path.join(tmp_path, "imgs")
    os.makedirs(d)
    for i, q in enumerate(qs):
        name = "{:06d}_0_{:.4f}_{:.4f}_{:.4f}_{:.4f}.png".format(i, *q)
        arr = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, name))

    class DS(ShapeDataset):
        rgb = True
        single_id = True

    ds1 = DS(d)
    ds1.warm_cache()
    assert os.path.exists(os.path.join(d, ShapeDataset._DISK_CACHE_NAME))
    ref = ds1.gather(np.arange(len(ds1)))

    def _boom(path, rgb):
        raise AssertionError("decoder called despite disk cache")

    monkeypatch.setattr(shapes_mod, "_load_image", _boom)
    ds2 = DS(d)
    ds2.warm_cache()
    got = ds2.gather(np.arange(len(ds2)))
    np.testing.assert_array_equal(got[2], ref[2])
    # pose labels BIT-identical across cold/warm cache states (the cache
    # stores float64 — a float32 round trip would drift ~1e-7)
    np.testing.assert_array_equal(got[1], ref[1])

    # stale-cache guard: adding a file changes the key -> decode again
    monkeypatch.setattr(shapes_mod, "_load_image",
                        lambda p, rgb: np.zeros((8, 8, 3), np.float32))
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        os.path.join(d, "000099_0_1.0000_0.0000_0.0000_0.0000.png"))
    ds3 = DS(d)
    ds3.warm_cache()
    assert len(ds3._cache) == 6          # re-decoded, not served stale


def test_random_split_reference_semantics():
    class Dummy:
        def __init__(self, n):
            self.n = n
            self.rgb = False

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return i

    ds = Dummy(100)
    valid, test, train = random_split(ds, [20, 20, 60])
    assert len(valid) == 20 and len(test) == 20 and len(train) == 60
    # identical indices as the reference: np.seed(0) permutation sliced
    # [offset-length:offset]
    np.random.seed(123)  # split must not depend on ambient state
    state = np.random.get_state()
    np.random.seed(0)
    perm = np.random.permutation(100)
    np.random.set_state(state)
    np.testing.assert_array_equal(valid.indices, perm[0:20])
    np.testing.assert_array_equal(test.indices, perm[20:40])
    np.testing.assert_array_equal(train.indices, perm[40:100])
    # attribute passthrough
    assert valid.rgb is False


def test_batch_loader_static_shapes():
    ds = ToyDataset.generate(n=53, degrees=2, rep_copies=3)
    loader = BatchLoader(ds, batch_size=16, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b[-1].shape == (16, 9, 3)
    # epoch reshuffles
    b2 = list(loader)
    assert not np.allclose(batches[0][-1], b2[0][-1])
    # eval loader keeps the ragged tail
    ev = BatchLoader(ds, batch_size=16, shuffle=False, drop_last=False)
    sizes = [b[-1].shape[0] for b in ev]
    assert sizes == [16, 16, 16, 5]


def test_batch_loader_threaded_matches_serial():
    ds = ToyDataset.generate(n=40, degrees=2, rep_copies=3)
    serial = list(BatchLoader(ds, 8, shuffle=False, num_threads=0))
    threaded = list(BatchLoader(ds, 8, shuffle=False, num_threads=3))
    for a, b in zip(serial, threaded):
        np.testing.assert_allclose(a[-1], b[-1])
