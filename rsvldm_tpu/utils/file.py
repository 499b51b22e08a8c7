"""File utilities: checkpoint download cache + delta/merge tools.

Parity target: /root/reference utils/file.py (load_file_from_url:50-79,
list_files) and llava/model/{apply_delta,make_delta,consolidate}.py —
re-implemented at the state-dict level so no HF model instantiation is
needed (torch is only used by the callers' loaders).
"""

from __future__ import annotations

import os
import shutil
import urllib.request
from pathlib import Path
from typing import Dict, Iterable

import numpy as np


def list_files(root: str, suffixes: Iterable[str] = (".png", ".jpg"),
               recursive: bool = True) -> list:
    """Sorted file listing filtered by suffix (utils/file.py list helper)."""
    root_p = Path(root)
    it = root_p.rglob("*") if recursive else root_p.iterdir()
    return sorted(str(p) for p in it
                  if p.is_file() and p.suffix.lower() in set(suffixes))


def load_file_from_url(url: str, model_dir: str | None = None,
                       progress: bool = True,
                       file_name: str | None = None) -> str:
    """Download-if-missing checkpoint fetch (utils/file.py:50-79). Uses a
    local cache dir; returns the cached path without touching the network
    when the file already exists. NOTE: this environment has no egress —
    the function is exercised with file:// URLs in tests and is the hook
    real deployments use for http(s) checkpoints."""
    if model_dir is None:
        model_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "rsvldm_tpu", "checkpoints")
    os.makedirs(model_dir, exist_ok=True)
    from urllib.parse import urlparse
    filename = file_name or os.path.basename(urlparse(url).path)
    cached = os.path.abspath(os.path.join(model_dir, filename))
    if not os.path.exists(cached):
        tmp = cached + ".part"
        with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(tmp, cached)
    return cached


# ----------------------------------------------------- delta/merge tools

def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def apply_delta(base_sd: Dict, delta_sd: Dict,
                extra_ok: Iterable[str] = ("model.mm_projector.weight",
                                           "model.mm_projector.bias")) -> Dict:
    """target = delta + base (llava/model/apply_delta.py:15-37): keys absent
    from base must be in the known-extra set (projector); shape mismatches
    are the vocab-extended embed/lm_head, where base adds into the leading
    slice."""
    out: Dict = {}
    for name, dparam in delta_sd.items():
        d = _to_np(dparam)
        if name not in base_sd:
            assert any(name.endswith(e) or name == e for e in extra_ok), name
            out[name] = d
            continue
        b = _to_np(base_sd[name])
        if d.shape == b.shape:
            out[name] = d + b
        else:
            assert name in ("model.embed_tokens.weight", "lm_head.weight"), (
                f"{name} dimension mismatch: {d.shape} vs {b.shape}")
            t = d.copy()
            t[: b.shape[0], : b.shape[1]] += b
            out[name] = t
    return out


def make_delta(base_sd: Dict, target_sd: Dict,
               extra_ok: Iterable[str] = ("model.mm_projector.weight",
                                          "model.mm_projector.bias")) -> Dict:
    """delta = target - base (llava/model/make_delta.py), inverse of
    apply_delta including the vocab-extension slice rule."""
    out: Dict = {}
    for name, tparam in target_sd.items():
        t = _to_np(tparam)
        if name not in base_sd:
            assert any(name.endswith(e) or name == e for e in extra_ok), name
            out[name] = t
            continue
        b = _to_np(base_sd[name])
        if t.shape == b.shape:
            out[name] = t - b
        else:
            assert name in ("model.embed_tokens.weight", "lm_head.weight")
            d = t.copy()
            d[: b.shape[0], : b.shape[1]] -= b
            out[name] = d
    return out


def consolidate(sd: Dict, drop_prefixes: Iterable[str] = ("base_model.model.",)
                ) -> Dict:
    """Strip training-wrapper prefixes so a finetuned checkpoint loads as a
    plain model (llava/model/consolidate.py semantics)."""
    out: Dict = {}
    for k, v in sd.items():
        for p in drop_prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out
