"""Interactive CLI chat with the captioner (llava/serve/cli.py parity).

Multi-turn: the first user message carries the <image> token; later turns
append to the conversation and the whole prompt re-prefills (the reference
relies on HF generate with cache reuse per call; at CLI interactivity
scale a re-prefill per turn is equivalent and keeps the scan-decode path
untouched). Dependency-free REPL over LlavaCaptioner internals.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import numpy as np

from ..models.vlm.generate import (DEFAULT_IMAGE_TOKEN, GenerateConfig,
                                   IMAGE_TOKEN_INDEX, render_llama3_chat,
                                   splice_image_embeds, tokenize_with_image)


@dataclasses.dataclass
class ChatSession:
    """Conversation state + one image (cli.py:54-93: image embeds attach to
    the first user message only)."""
    captioner: object
    image: object
    cfg: GenerateConfig = dataclasses.field(
        default_factory=lambda: GenerateConfig(max_new_tokens=512))
    turns: List[Tuple[str, str]] = dataclasses.field(default_factory=list)
    _image_tokens: Optional[np.ndarray] = None

    def _encode_image(self):
        if self._image_tokens is not None:
            return self._image_tokens
        from ..models.vlm.generate import anyres_image_features
        cap = self.captioner
        self._image_tokens = np.asarray(anyres_image_features(
            lambda px: cap.vision.apply(cap.vision_params, px),
            lambda f: cap.projector.apply(cap.projector_params, f),
            self.image, cap.image_newline, cap.vision.cfg.image_size))
        return self._image_tokens

    def ask(self, user_msg: str, rng: jax.Array | None = None) -> str:
        from ..models.vlm.generate import generate
        import jax.numpy as jnp
        cap = self.captioner
        if DEFAULT_IMAGE_TOKEN in user_msg:
            # splice_image_embeds fills ONE sentinel; a user-typed
            # placeholder would silently embed clamped token-0 garbage
            raise ValueError(
                "the CLI attaches the image automatically — remove the "
                f"{DEFAULT_IMAGE_TOKEN} placeholder from the message")
        if not self.turns:  # first turn carries the image (cli.py:68-73)
            user_msg = DEFAULT_IMAGE_TOKEN + "\n" + user_msg
        self.turns.append(("user", user_msg))
        prompt = render_llama3_chat(self.turns)
        encode = lambda s: cap.tokenizer.encode(s, add_special_tokens=False)
        ids = tokenize_with_image(prompt, encode)
        safe = jnp.asarray(np.where(ids == IMAGE_TOKEN_INDEX, 0, ids))
        text_embeds = cap.llama.apply(cap.llama_params, safe,
                                      method=cap.llama.embed)
        if (ids == IMAGE_TOKEN_INDEX).any():
            embeds = splice_image_embeds(ids, text_embeds,
                                         jnp.asarray(self._encode_image()))
        else:
            embeds = text_embeds
        rng = jax.random.PRNGKey(len(self.turns)) if rng is None else rng
        out_ids = generate(cap.llama, cap.llama_params, embeds, self.cfg,
                           rng, mesh=getattr(cap, "mesh", None))
        reply = cap.tokenizer.decode(out_ids.tolist(),
                                     skip_special_tokens=True).strip()
        self.turns.append(("assistant", reply))
        return reply


def main(argv=None):
    import argparse
    from pathlib import Path
    from PIL import Image
    from ..models.vlm.captioner import LlavaCaptioner

    ap = argparse.ArgumentParser(description="LLaVA CLI chat (serve/cli.py)")
    ap.add_argument("--ckpt_dir", default="./CKPT_PTH")
    ap.add_argument("--image-file", required=True)
    ap.add_argument("--temperature", type=float, default=0.2)
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--load-8bit", action="store_true", default=True,
                    help="int8 weight-only decoder (model_worker.py "
                         "--load-8bit equivalent; default on — 8B fits one "
                         "16GB chip)")
    ap.add_argument("--no-load-8bit", dest="load_8bit", action="store_false")
    ap.add_argument("--load-4bit", action="store_true",
                    help="int4 weight-only decoder (--load-4bit / NF4 "
                         "equivalent; ~4.3 GB weights, ~2x decode tok/s)")
    args = ap.parse_args(argv)

    quant = "int4" if args.load_4bit else ("int8" if args.load_8bit else None)
    cap = LlavaCaptioner.load(Path(args.ckpt_dir), quant=quant)
    if cap is None:
        raise SystemExit(f"no llava assets under {args.ckpt_dir}")
    sess = ChatSession(cap, Image.open(args.image_file).convert("RGB"),
                       GenerateConfig(max_new_tokens=args.max_new_tokens,
                                      temperature=args.temperature,
                                      do_sample=args.temperature > 0))
    while True:
        try:
            inp = input("user: ")
        except EOFError:
            inp = ""
        if not inp:
            print("exit...")
            break
        try:
            print("assistant:", sess.ask(inp))
        except ValueError as e:  # e.g. a user-typed <image> placeholder
            print(f"error: {e}")


if __name__ == "__main__":
    main()
