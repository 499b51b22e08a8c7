"""Checkpoint IO: orbax native format + one-time torch conversion cache.

Replaces the reference's per-model loaders (SURVEY §5): SR3
save_network/load_network (models/sr3_model/model.py:127-170), sgm
init_from_ckpt with two-ckpt overlay (sgm/models/diffusion.py:84-102,
models/util.py:98-100) and HF/PEFT loading (models/util.py:111-117).

Flow: published torch checkpoints are converted once (utils/convert*.py)
and cached as orbax checkpoints under <ckpt_dir>/jax/<name>; subsequent runs
restore the orbax copy directly (fast, torch-free).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Callable, Dict

import jax
import numpy as np


def strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Re-export of convert.strip_prefix — the pipeline's lazy conversion
    plans and convert_ckpt.py call it as ckpt.strip_prefix (a bare import
    here avoids a convert<->checkpoint cycle at module load)."""
    from .convert import strip_prefix as _sp
    return _sp(sd, prefix)


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth/.ckpt (torch.load) or .safetensors state dict."""
    path = str(path)
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        sd = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def overlay(base: Dict[str, Any], *overrides: Dict[str, Any]) -> Dict[str, Any]:
    """Non-strict two-ckpt overlay (juggernaut base then SR-v0Q adapter,
    models/util.py:98-100): later dicts win key-by-key."""
    out = dict(base)
    for o in overrides:
        out.update(o)
    return out


def save_orbax(params, path: str | Path) -> None:
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str | Path):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute())


def load_or_convert(ckpt_dir: str | Path, name: str,
                    torch_paths: list[str],
                    convert_fn: Callable[[Dict[str, Any]], Any]):
    """Restore <ckpt_dir>/jax/<name> if present; else convert the torch
    checkpoint(s) (overlaid in order), cache as orbax, return params.
    Returns None when neither exists (caller decides: random init + warn)."""
    ckpt_dir = Path(ckpt_dir)
    cache = ckpt_dir / "jax" / name
    if cache.exists():
        return load_orbax(cache)
    existing = [p for p in torch_paths if os.path.exists(p)]
    if not existing:
        return None
    sds = [load_torch_state_dict(p) for p in existing]
    params = convert_fn(overlay(*sds) if len(sds) > 1 else sds[0])
    save_orbax(params, cache)
    return params
