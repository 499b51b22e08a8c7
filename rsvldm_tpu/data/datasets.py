"""Datasets for SR3 inference/training (host-side NumPy/PIL).

Parity target: /root/reference data/dataset.py (SR_Dataset single-image
bicubic-up + center crop + [-1,1] :7-42), data/LRHR_dataset.py (lr/sr/hr
triplet trees, hflip augmentation :11-101) and data/util.py
(transform_augment:77).
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}


def _to_pm1(img) -> np.ndarray:
    x = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (x - 0.5) / 0.5


def augment(arrays: list[np.ndarray], hflip: bool = True,
            rot: bool = False, rng: random.Random | None = None):
    """Joint flip/rot augmentation across a triplet (data/util.py:77-92)."""
    rng = rng or random
    do_h = hflip and rng.random() < 0.5
    do_v = rot and rng.random() < 0.5
    do_r = rot and rng.random() < 0.5
    out = []
    for a in arrays:
        if do_h:
            a = a[:, ::-1, :]
        if do_v:
            a = a[::-1, :, :]
        if do_r:
            a = a.transpose(1, 0, 2)
        out.append(np.ascontiguousarray(a))
    return out


class SingleImageDataset:
    """One image -> bicubic x upscale, center crop, [-1,1]
    (data/dataset.py:30-42)."""

    def __init__(self, path: str, upscale: int):
        self.path = path
        self.upscale = upscale

    def __len__(self):
        return 1

    def __getitem__(self, idx):
        from ..ops.image import load_lr_conditioning
        return {"SR": load_lr_conditioning(self.path, self.upscale)}


class LRHRDataset:
    """lr/sr/hr triplet trees: sr_{l}_{r}/ hr_{r}/ lr_{l}/
    (data/LRHR_dataset.py:11-101). Yields (HR, SR_bicubic) arrays in [-1,1];
    `need_lr` adds the raw LR."""

    def __init__(self, root: str, l_res: int, r_res: int, split: str = "train",
                 data_len: int = -1, need_lr: bool = False, hflip: bool = True):
        root = Path(root)
        self.hr_dir = root / f"hr_{r_res}"
        self.sr_dir = root / f"sr_{l_res}_{r_res}"
        self.lr_dir = root / f"lr_{l_res}"
        self.need_lr = need_lr
        self.split = split
        self.hflip = hflip and split == "train"
        names = sorted(p.name for p in self.hr_dir.iterdir()
                       if p.suffix.lower() in IMG_EXTS)
        if data_len > 0:
            names = names[:data_len]
        self.names = names

    def __len__(self):
        return len(self.names)

    def __getitem__(self, idx):
        return self.getitem_rng(idx, None)

    def getitem_rng(self, idx, rng):
        """__getitem__ with an explicit augmentation RNG — prefetch.
        make_loader keys one on (seed, epoch, idx) so the flip decisions
        are deterministic across any worker-thread count. rng=None keeps
        the global-random behavior."""
        name = self.names[idx]
        hr = _to_pm1(Image.open(self.hr_dir / name))
        sr = _to_pm1(Image.open(self.sr_dir / name))
        arrays = [hr, sr]
        if self.need_lr:
            arrays.append(_to_pm1(Image.open(self.lr_dir / name)))
        if self.hflip:
            arrays = augment(arrays, hflip=True, rng=rng)
        return tuple(arrays)

    def batches(self, batch_size: int, rng: random.Random | None = None,
                drop_last: bool = True):
        """Infinite shuffled batch iterator of stacked (HR, SR) arrays."""
        rng = rng or random.Random(0)
        order = list(range(len(self)))
        while True:
            rng.shuffle(order)
            for i in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[j] for j in order[i:i + batch_size]]
                yield tuple(np.stack(col) for col in zip(*items))


class LmdbLRHRDataset:
    """lmdb triplet backend (data/LRHR_dataset.py:20-88): keys
    'hr_{r}_{idx:05d}' / 'sr_{l}_{r}_{idx:05d}' / 'lr_{l}_{idx:05d}' holding
    encoded image bytes, plus a 'length' record. `env` may be an open
    lmdb.Environment-like object (anything with .begin() returning a
    context manager with .get(bytes)) or a path string, opened with lmdb
    when the library is importable (it is env-gated in this image)."""

    def __init__(self, env, l_res: int, r_res: int, split: str = "train",
                 data_len: int = -1, need_lr: bool = False, hflip: bool = True):
        if isinstance(env, (str, Path)):
            try:
                import lmdb
            except ImportError as e:
                raise ImportError(
                    "lmdb backend requested but the lmdb package is not "
                    "installed; pass an env-like object or use LRHRDataset "
                    "(image-dir backend)") from e
            env = lmdb.open(str(env), readonly=True, lock=False,
                            readahead=False, meminit=False)
        self.env = env
        self.l_res = l_res
        self.r_res = r_res
        self.need_lr = need_lr
        self.hflip = hflip and split == "train"
        with self.env.begin() as txn:
            n = int(txn.get(b"length"))
        self.data_len = n if data_len <= 0 else min(data_len, n)

    def __len__(self):
        return self.data_len

    def _decode(self, raw: bytes):
        import io
        return _to_pm1(Image.open(io.BytesIO(raw)).convert("RGB"))

    def __getitem__(self, idx: int):
        return self.getitem_rng(idx, None)

    def getitem_rng(self, idx: int, rng):
        with self.env.begin() as txn:
            hr = txn.get(f"hr_{self.r_res}_{str(idx).zfill(5)}".encode())
            sr = txn.get(
                f"sr_{self.l_res}_{self.r_res}_{str(idx).zfill(5)}".encode())
            lr = txn.get(f"lr_{self.l_res}_{str(idx).zfill(5)}".encode()) \
                if self.need_lr else None
        if hr is None or sr is None or (self.need_lr and lr is None):
            raise KeyError(f"missing lmdb record for index {idx}")
        arrays = [self._decode(hr), self._decode(sr)]
        if self.need_lr:
            arrays.append(self._decode(lr))
        if self.hflip:
            arrays = augment(arrays, hflip=True, rng=rng)
        return tuple(arrays)
