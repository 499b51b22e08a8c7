"""Offline bicubic triplet generation (lr/hr/sr trees).

Parity target: /root/reference data/prepare_data.py (prepare:101,
resize_multiple:31 — mod-crop HR to a multiple of the scale, bicubic LR,
bicubic re-up SR) and the MATLAB variant data/generate_bicubic_img.m.
Multiprocess over images via concurrent.futures.
"""

from __future__ import annotations

import concurrent.futures as cf
from pathlib import Path

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

from .datasets import IMG_EXTS


def _process_one(src: Path, out_root: Path, l_res: int, r_res: int):
    img = Image.open(src).convert("RGB")
    # center-crop to r_res square (prepare_data resize path)
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2,
                    (w - s) // 2 + s, (h - s) // 2 + s))
    hr = img.resize((r_res, r_res), Image.BICUBIC)
    lr = hr.resize((l_res, l_res), Image.BICUBIC)
    sr = lr.resize((r_res, r_res), Image.BICUBIC)
    hr.save(out_root / f"hr_{r_res}" / src.name)
    lr.save(out_root / f"lr_{l_res}" / src.name)
    sr.save(out_root / f"sr_{l_res}_{r_res}" / src.name)
    return src.name


def prepare_triplets(src_dir: str, out_dir: str, l_res: int = 28,
                     r_res: int = 224, workers: int = 8) -> list[str]:
    """Build the hr_{r}/ lr_{l}/ sr_{l}_{r}/ trees from a folder of images."""
    src = Path(src_dir)
    out = Path(out_dir)
    for d in [f"hr_{r_res}", f"lr_{l_res}", f"sr_{l_res}_{r_res}"]:
        (out / d).mkdir(parents=True, exist_ok=True)
    images = sorted(p for p in src.iterdir() if p.suffix.lower() in IMG_EXTS)
    done = []
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        for name in ex.map(lambda p: _process_one(p, out, l_res, r_res), images):
            done.append(name)
    return done
