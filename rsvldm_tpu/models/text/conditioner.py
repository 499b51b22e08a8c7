"""SDXL conditioner: dual text encoders + micro-conditioning Fourier embeds.

Parity target: /root/reference sgm/modules/encoders/modules.py —
GeneralConditioner routing by tensor rank (:121-165),
GeneralConditionerWithControl (:184-234), ConcatTimestepEmbedderND
(:1031-1047) — with the 5-embedder plan of juggernautXL.yaml:66-105:

  crossattn [N,77,2048] = concat(CLIP-L penultimate 768, bigG penultimate 1280)
  vector    [N,2816]    = concat(bigG pooled 1280,
                                 fourier(original_size) 512,
                                 fourier(crop_coords) 512,
                                 fourier(target_size) 512)
  control   [N,h,w,4]   = LQ latent (routed through, conditioner-with-control)

The unconditional branch re-encodes the negative prompt with identical
micro-conds (get_unconditional_conditioning, :167-181).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from ..sdxl.unet import timestep_embedding
from .clip import CLIPTextTransformer


def concat_timestep_embedding(values: jnp.ndarray, outdim: int = 256) -> jnp.ndarray:
    """ConcatTimestepEmbedderND: per-scalar sinusoid, concatenated
    (modules.py:1031-1047). values: [N, D] -> [N, D*outdim]."""
    n, d = values.shape
    emb = timestep_embedding(values.reshape(-1), outdim)
    return emb.reshape(n, d * outdim)


@dataclasses.dataclass
class SDXLConditioner:
    """Functional conditioner bound to both text towers' params."""
    clip_l: CLIPTextTransformer
    big_g: CLIPTextTransformer
    clip_l_params: Any
    big_g_params: Any

    def encode_text(self, tokens_l: jnp.ndarray, tokens_g: jnp.ndarray):
        out_l = self.clip_l.apply(self.clip_l_params, tokens_l)
        out_g = self.big_g.apply(self.big_g_params, tokens_g)
        crossattn = jnp.concatenate(
            [out_l["penultimate"], out_g["penultimate"]], axis=-1)
        return crossattn, out_g["pooled"]

    def __call__(self, tokens_l, tokens_g, control,
                 original_size=(1024, 1024), crop_coords=(0, 0),
                 target_size=(1024, 1024)) -> Dict[str, jnp.ndarray]:
        """Build the cond dict for one prompt batch.

        Micro-conds use the SR defaults from SR_backbone.prepare_condition
        (models/SR_model.py:127-135): 1024^2 original/target, crop (0,0)."""
        n = tokens_l.shape[0]
        crossattn, pooled = self.encode_text(tokens_l, tokens_g)
        mk = lambda pair: jnp.tile(jnp.asarray(pair, jnp.float32)[None], (n, 1))
        vector = jnp.concatenate([
            pooled,
            concat_timestep_embedding(mk(original_size)),
            concat_timestep_embedding(mk(crop_coords)),
            concat_timestep_embedding(mk(target_size)),
        ], axis=-1)
        return dict(crossattn=crossattn, vector=vector, control=control)

    def paired(self, tokens_l_c, tokens_g_c, tokens_l_uc, tokens_g_uc, control,
               **kw):
        """(cond, uncond) with shared micro-conds/control
        (get_unconditional_conditioning)."""
        c = self(tokens_l_c, tokens_g_c, control, **kw)
        uc = self(tokens_l_uc, tokens_g_uc, control, **kw)
        return c, uc


class PreparedConditioner:
    """Precomputed conditioning buffers loaded from disk (sgm
    PreparedConditioner, encoders/modules.py:237-281): skips the text towers
    entirely when the prompt set is fixed. Save with `save`; `paired`
    broadcasts the stored cond/uncond to the batch and attaches control."""

    def __init__(self, crossattn_c, vector_c, crossattn_uc, vector_uc):
        self.crossattn_c = jnp.asarray(crossattn_c)
        self.vector_c = jnp.asarray(vector_c)
        self.crossattn_uc = jnp.asarray(crossattn_uc)
        self.vector_uc = jnp.asarray(vector_uc)

    @classmethod
    def load(cls, path: str) -> "PreparedConditioner":
        import numpy as np
        z = np.load(path)
        return cls(z["crossattn_c"], z["vector_c"],
                   z["crossattn_uc"], z["vector_uc"])

    @staticmethod
    def save(path: str, cond: Dict, uc: Dict) -> None:
        import numpy as np
        np.savez(path, crossattn_c=np.asarray(cond["crossattn"]),
                 vector_c=np.asarray(cond["vector"]),
                 crossattn_uc=np.asarray(uc["crossattn"]),
                 vector_uc=np.asarray(uc["vector"]))

    def paired(self, control):
        n = control.shape[0]
        tile = lambda x: jnp.tile(x[:1], (n,) + (1,) * (x.ndim - 1))
        c = dict(crossattn=tile(self.crossattn_c), vector=tile(self.vector_c),
                 control=control)
        uc = dict(crossattn=tile(self.crossattn_uc),
                  vector=tile(self.vector_uc), control=control)
        return c, uc
