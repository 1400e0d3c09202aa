"""Image-folder datasets with pose labels parsed from filenames.

Reference: lie_vae/experiments/datasets.py:15-127. Same index semantics
(files.txt or recursive jpg/png glob, sorted), same seeded subsampling
(numpy seed 0 with state save/restore), same filename-quaternion regex —
datasets on disk are interchangeable between the two frameworks.

TPU-first deltas: images load as NHWC float32 numpy (not NCHW torch
tensors), and batches are assembled host-side into single contiguous
arrays ready for a one-shot device put.
"""
import hashlib
import os
import re
from glob import glob

import numpy as np

from lie_vae_tpu.data._np_ops import quaternions_to_group_matrix_np

_QUAT_RE = re.compile(r"-?[01]\.[0-9]{4}")
_NAME_RE = re.compile(r"([A-z0-9]+)\.obj")


def filename_to_quaternion(filename):
    """Pose label from filename: four '-x.xxxx' floats.

    Reference: datasets.py:67-72 (same regex).
    """
    matches = _QUAT_RE.findall(filename)
    assert len(matches) == 4, "No quaternion found in " + filename
    return [float(x) for x in matches]


def filename_to_name(filename):
    match = _NAME_RE.search(filename)
    assert match is not None, "Could not find object id from filename"
    return match.group(1)


def count_renders(directory):
    """Number of rendered images under ``directory`` (0 if absent).

    Counts only jpg/png files — dataset dirs also accumulate non-image
    files (e.g. the loader's persistent decode cache), so a plain
    ``len(os.listdir())`` over-counts and can skip a needed render.
    """
    if not os.path.isdir(directory):
        return 0
    return (len(glob(os.path.join(directory, "**/*.jpg"), recursive=True))
            + len(glob(os.path.join(directory, "**/*.png"), recursive=True)))


def _load_image(path, rgb):
    from PIL import Image
    img = np.asarray(Image.open(path), dtype=np.float32) / 255.0
    if rgb:
        return img[:, :, :3]                       # HWC
    if img.ndim == 3:                              # mean if RGB
        img = img.mean(-1)
    return img[:, :, None]                         # HW1


class ShapeDataset:
    """Reference: ShapeDataset, datasets.py:15-84.

    ``cache=True`` (default) decodes each image once into a shared uint8
    array (~12 KB per 64x64 RGB image) instead of re-decoding PNGs every
    epoch through loader workers like the reference — image epochs become
    memory-bandwidth-bound after the first pass.
    """
    num_workers = 5
    rgb = False
    single_id = False

    def __init__(self, directory, subsample=1.0, cache=True):
        self.directory = directory
        self._cache_enabled = cache
        self._cache = {}
        index_path = os.path.join(directory, "files.txt")
        if os.path.exists(index_path):
            with open(index_path) as f:
                self.files = f.read().splitlines()
            self.root = directory
        else:
            self.files = glob(os.path.join(directory, "**/*.jpg"),
                              recursive=True)
            self.files += glob(os.path.join(directory, "**/*.png"),
                               recursive=True)
            self.root = None
        self.files = sorted(self.files)

        if subsample < 1:
            # identical seed semantics to datasets.py:33-37
            state = np.random.get_state()
            np.random.seed(0)
            self.files = list(np.random.choice(
                self.files, int(len(self.files) * subsample), replace=False))
            np.random.set_state(state)

    def __len__(self):
        return len(self.files)

    def _item_by_file_index(self, idx):
        idx = int(idx)
        if self._cache_enabled:
            hit = self._cache.get(idx)
            if hit is not None:
                name, group_el, img_u8 = hit
                return name, group_el, img_u8.astype(np.float32) / 255.0
        name, group_el, image = self.load_file(self.files[idx], self.root)
        if self._cache_enabled:
            self._cache[idx] = (name, group_el,
                                np.round(image * 255.0).astype(np.uint8))
        return name, group_el, image

    def __getitem__(self, idx):
        return self._item_by_file_index(idx)

    @classmethod
    def load_file(cls, filename, root):
        path = os.path.join(root, filename) if root else filename
        image = _load_image(path, cls.rgb)
        quaternion = filename_to_quaternion(filename)
        group_el = quaternions_to_group_matrix_np(np.asarray(quaternion))
        name = 0 if cls.single_id else filename_to_name(filename)
        return name, group_el, image

    # v2: pose labels stored float64 (v1 cached float32, which made warm
    # and cold cache states differ at the 1e-7 level)
    _DISK_CACHE_NAME = "_decoded_cache_v2.npz"

    def _files_key(self):
        # filenames + size + mtime: re-rendered pixels under identical
        # names (e.g. a renderer change) must invalidate the cache too
        parts = []
        for f in self.files:
            path = os.path.join(self.root, f) if self.root else f
            try:
                st = os.stat(path)
                parts.append(f"{f}|{st.st_size}|{st.st_mtime_ns}")
            except OSError:
                parts.append(f)
        return hashlib.sha256("\n".join(parts).encode()).hexdigest()

    def _disk_cache_path(self):
        if not self.directory or not os.path.isdir(self.directory):
            return None
        return os.path.join(self.directory, self._DISK_CACHE_NAME)

    def warm_cache(self, persist=True):
        """Fill the uint8 decode cache for EVERY file at once, backed by a
        persistent bulk cache on disk (``<dir>/_decoded_cache_v1.npz``).

        The device-resident data path decodes the whole dataset up front
        (train/loop.py); per-PNG PIL decode makes that scale linearly with
        dataset size (~1 min for 32k images). The disk cache turns every
        later startup into one bulk uint8 read (<2 s at 32k). Keyed by a
        hash of the (post-subsample) file list, so a stale or
        foreign cache can never serve wrong pixels — it is simply
        re-decoded and overwritten.
        """
        if not self._cache_enabled or len(self._cache) >= len(self.files):
            return
        n = len(self.files)
        path = self._disk_cache_path()
        key = self._files_key()
        if path and os.path.exists(path):
            try:
                z = np.load(path, allow_pickle=False)
                if str(z["key"]) == key:
                    imgs, gs, names = z["imgs"], z["gs"], z["names"]
                    for i in range(n):
                        nm = (int(names[i]) if self.single_id
                              else str(names[i]))
                        self._cache[i] = (nm, gs[i], imgs[i])
                    return
            except Exception:
                pass   # unreadable or stale cache: re-decode below
        for i in range(n):
            self._gather_one(i)
        if persist and path:
            names, gs, imgs = zip(*(self._cache[i] for i in range(n)))
            tmp = path + ".tmp.npz"   # ends in .npz so savez keeps the name
            np.savez(tmp, key=np.asarray(key),
                     names=np.asarray(
                         names, dtype=np.int32 if self.single_id else None),
                     # float64: the fresh-decode path produces float64
                     # labels, and warm/cold cache states must be
                     # bit-identical for seeded-run reproducibility
                     gs=np.stack(gs, 0),
                     imgs=np.stack(imgs, 0))
            os.replace(tmp, path)

    def gather(self, indices):
        """Batch fetch. Images are returned as uint8 — 4x less host->device
        traffic; the training step normalizes to float on device (a real
        win when host->chip bandwidth is the bottleneck)."""
        names, gs, imgs = zip(*[self._gather_one(i) for i in indices])
        return (np.asarray(names, dtype=object if not self.single_id
                           else np.int32),
                np.stack(gs, 0), np.stack(imgs, 0))

    def _gather_one(self, idx):
        idx = int(idx)
        if self._cache_enabled:
            hit = self._cache.get(idx)
            if hit is None:
                self._item_by_file_index(idx)   # fills the cache
                hit = self._cache[idx]
            return hit
        name, g, img = self.load_file(self.files[idx], self.root)
        return name, g, np.round(img * 255.0).astype(np.uint8)

    @staticmethod
    def prep_batch(batch):
        return batch


class SphereCubeDataset(ShapeDataset):
    """Reference: datasets.py:87-92."""
    rgb = True
    single_id = True

    def __init__(self, directory="data/spherecube", subsample=1.0):
        super().__init__(directory, subsample=subsample)


class ScPairsDataset(ShapeDataset):
    """Consecutive-pose pairs stacked along a pair axis; prep_batch flattens
    the pairs into the batch. Reference: datasets.py:95-127."""
    rgb = True
    single_id = True

    def __init__(self, directory="data/sc-pairs", subsample=1.0):
        super().__init__(directory)
        n = len(self.files) // 2
        if subsample < 1:
            state = np.random.get_state()
            np.random.seed(0)
            self.indices = np.random.permutation(n)[:int(n * subsample)]
            np.random.set_state(state)
        else:
            self.indices = np.arange(n)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        idx = self.indices[idx]
        assert 2 * idx + 1 < len(self.files), "File not found"
        names, gs, imgs = zip(*[self._item_by_file_index(j)
                                for j in (2 * idx, 2 * idx + 1)])
        return (np.asarray(names, dtype=np.int32),
                np.stack(gs, 0), np.stack(imgs, 0))

    def gather(self, indices):
        names, gs, imgs = zip(*[self._gather_pair(i) for i in indices])
        return np.stack(names, 0), np.stack(gs, 0), np.stack(imgs, 0)

    def _gather_pair(self, idx):
        idx = self.indices[idx]
        names, gs, imgs = zip(*[self._gather_one(j)
                                for j in (2 * idx, 2 * idx + 1)])
        return (np.asarray(names, dtype=np.int32), np.stack(gs, 0),
                np.stack(imgs, 0))

    @staticmethod
    def prep_batch(batch):
        # flatten (B, 2, ...) pairs into the batch axis (datasets.py:125-127)
        return [t.reshape((-1,) + t.shape[2:]) for t in batch]
