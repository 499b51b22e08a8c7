"""Video-frame sampling for VLM inputs.

Parity targets: /root/reference llava/train/train.py:1170-1205 — the
frame-folder branch ("shareVideoGPTV": sorted frame files, uniform
linspace sampling at an assumed 2 fps, optional time-instruction text) —
and llava/utils.py:25-46 process_video_with_decord — container videos
(mp4/avi/...) decoded and fps-downsampled with an upper bound on frame
count. decord/pyav are not in this image; :func:`process_video` reproduces
the decord semantics on OpenCV's VideoCapture (same containers, same
sampling arithmetic, including the reference's frame_time quirk of
dividing by the sampling STEP outside the upbound branch).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np

FRAME_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp"}
ASSUMED_FPS = 2.0  # train.py avg_fps


def sample_video_frames(frame_dir: str, num_frames: int = 10
                        ) -> Tuple[List, float, str]:
    """Uniformly sample `num_frames` from a sorted frame folder.

    Returns (PIL frames, video_time_seconds, frame_time_string) matching
    the tuple train.py builds for the time instruction."""
    from PIL import Image
    files = sorted(p for p in Path(frame_dir).iterdir()
                   if p.suffix.lower() in FRAME_EXTS)
    if not files:
        raise FileNotFoundError(f"no frames under {frame_dir}")
    total = len(files)
    idx = np.linspace(0, total - 1, min(num_frames, total)).astype(int)
    frames = [Image.open(files[i]).convert("RGB") for i in idx]
    frame_time = ",".join(f"{i / ASSUMED_FPS:.2f}s" for i in idx)
    video_time = total / ASSUMED_FPS
    return frames, video_time, frame_time


def process_video(video_file: str, video_fps: int = 1,
                  frames_upbound: int = 0, force_sample: bool = False
                  ) -> Tuple[np.ndarray, float, str, int]:
    """Decode a container video and sample frames — the decord path
    (utils.py:25-46) on OpenCV.

    Returns (frames uint8 [N,H,W,3] RGB, video_time_seconds,
    frame_time_string, num_frames) exactly like
    process_video_with_decord. Sampling arithmetic is bit-compatible:
    step = round(fps / video_fps); indices range(0, total, step);
    frame_time = idx/step (the reference's own quirk — sample periods,
    not seconds) unless the upbound resample triggers, where it is
    idx/fps seconds."""
    try:
        import cv2
    except ImportError as e:  # keep the frame-folder path usable without cv2
        raise ImportError(
            "container video decode needs OpenCV (cv2); frame folders "
            "work without it via sample_video_frames") from e
    cap = cv2.VideoCapture(str(video_file))
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_file}")
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = cap.get(cv2.CAP_PROP_FPS) or ASSUMED_FPS
        if total <= 0:
            raise ValueError(f"container reports no frames: {video_file}")
        video_time = total / fps
        step = max(1, round(fps / video_fps))
        frame_idx = list(range(0, total, step))
        frame_time = [i / step for i in frame_idx]  # utils.py:32 quirk
        if frames_upbound > 0 and (len(frame_idx) > frames_upbound
                                   or force_sample):
            frame_idx = np.linspace(0, total - 1, frames_upbound,
                                    dtype=int).tolist()
            frame_time = [i / fps for i in frame_idx]
        wanted = set(frame_idx)
        frames = {}
        # sparse sampling (e.g. frames_upbound=32 of an hour-long video)
        # must not sequentially decode the whole container — seek per
        # index instead; dense sampling decodes sequentially (seeking to
        # every other frame would re-decode from each keyframe)
        if total > 8 * len(frame_idx):
            for i in frame_idx:
                cap.set(cv2.CAP_PROP_POS_FRAMES, i)
                ok, bgr = cap.read()
                if ok:
                    frames[i] = bgr[..., ::-1]
        if len(frames) < len(wanted):
            if frames:  # seek produced partial results — restart clean
                cap.release()
                cap = cv2.VideoCapture(str(video_file))
                frames = {}
            pos = 0
            while pos <= frame_idx[-1]:
                if not cap.grab():
                    break
                if pos in wanted:
                    ok, bgr = cap.retrieve()
                    if ok:
                        frames[pos] = bgr[..., ::-1]  # BGR -> RGB
                pos += 1
        missing = [i for i in frame_idx if i not in frames]
        if missing:
            raise ValueError(
                f"could not decode frames {missing[:5]}... of {video_file} "
                f"(container frame count {total} may be inaccurate)")
        video = np.stack([frames[i] for i in frame_idx])
        time_str = ",".join(f"{t:.2f}s" for t in frame_time)
        return video, video_time, time_str, len(frame_idx)
    finally:
        cap.release()


def time_instruction(video_time: float, num_frames: int,
                     frame_time: str) -> str:
    """The add_time_instruction prefix (train.py:1199-1201), verbatim
    format."""
    return (f"The video lasts for {video_time:.2f} seconds, and "
            f"{num_frames} frames are uniformly sampled from it. These "
            f"frames are located at {frame_time}.Please answer the "
            f"following questions related to this video.")


def clip_preprocess_frame(frame, size: int) -> np.ndarray:
    """CLIPImageProcessor transform for a video frame (train.py:1197
    processor.preprocess(video)): BICUBIC resize so the SHORTEST edge hits
    `size` (aspect preserved), then center crop size x size. Returns
    float32 [size, size, 3] in [0,1] (CLIP normalization happens on
    device, vision.normalize_pixels)."""
    from PIL import Image
    img = frame.convert("RGB")
    w, h = img.size
    scale = size / min(w, h)
    nw, nh = round(w * scale), round(h * scale)
    img = img.resize((nw, nh), Image.BICUBIC)
    left, top = (nw - size) // 2, (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.float32) / 255.0


# ------------------------------------------------- video feature stream
# The LLaVA-Video feature path (llava_arch.py:173-360): per-frame
# PROJECTED tower features are 2D-spatial-pooled, then newline tokens are
# placed per the mm_newline_position mode, and the flat stream splices at
# the record's single <image> token. Reference train defaults:
# mm_spatial_pool_mode="bilinear", mm_newline_position="grid"
# (train.py:93-114).

def _interp_axis(n_in: int, n_out: int):
    """torch F.interpolate(mode='bilinear', align_corners=False) sample
    positions along one axis (half-pixel centers, edge-clamped, NO
    antialias — jax.image.resize antialias-filters downscales, which the
    reference does not)."""
    x = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    x0 = np.floor(x).astype(int)
    frac = (x - x0).astype(np.float32)
    return (np.clip(x0, 0, n_in - 1), np.clip(x0 + 1, 0, n_in - 1), frac)


def pool_2d(feats, stride: int = 2, mode: str = "bilinear"):
    """get_2dPool parity (llava_arch.py:173-193): [T, P, D] with P = h*h
    -> [T, P', D]. average/max use kernel==stride (floor output, trailing
    remainder dropped, torch *_pool2d semantics); bilinear resizes to
    ceil(h/stride) at half-pixel centers."""
    import math

    import jax.numpy as jnp
    t, p, d = feats.shape
    h = math.isqrt(p)
    if h * h != p:
        raise ValueError(f"video features are not square: {p} tokens")
    x = feats.reshape(t, h, h, d)
    if mode in ("average", "max"):
        h2 = h // stride
        x = x[:, :h2 * stride, :h2 * stride]
        x = x.reshape(t, h2, stride, h2, stride, d)
        x = x.mean(axis=(2, 4)) if mode == "average" else x.max(axis=(2, 4))
        return x.reshape(t, h2 * h2, d)
    if mode == "bilinear":
        out = math.ceil(h / stride)

        def lin(arr, axis):
            lo, hi, fr = _interp_axis(arr.shape[axis], out)
            a = jnp.take(arr, lo, axis=axis)
            b = jnp.take(arr, hi, axis=axis)
            shape = [1] * arr.ndim
            shape[axis] = out
            fr = jnp.asarray(fr).reshape(shape).astype(arr.dtype)
            return a * (1 - fr) + b * fr

        x = lin(lin(x, 1), 2)
        return x.reshape(t, out * out, d)
    raise ValueError(f"Unexpected mm_spatial_pool_mode: {mode}")


def add_token_per_frame(feats, newline):
    """Append the image_newline embedding after each frame's tokens
    (llava_arch.py:247-251): [T, P, D] -> [T, P+1, D]."""
    import jax.numpy as jnp
    t, _, d = feats.shape
    nl = jnp.broadcast_to(newline.astype(feats.dtype), (t, 1, d))
    return jnp.concatenate([feats, nl], axis=1)


def add_token_per_grid(feats, newline):
    """Append the image_newline after each GRID ROW of each frame
    (llava_arch.py:224-245 view/permute dance, frame-major row-major):
    [T, h*h, D] -> [T*h*(h+1), D]."""
    import math

    import jax.numpy as jnp
    t, p, d = feats.shape
    h = math.isqrt(p)
    x = feats.reshape(t, h, h, d)
    nl = jnp.broadcast_to(newline.astype(feats.dtype), (t, h, 1, d))
    return jnp.concatenate([x, nl], axis=2).reshape(t * h * (h + 1), d)


def video_feature_stream(proj_feats, newline, stride: int = 2,
                         pool_mode: str = "bilinear",
                         newline_position: str = "grid",
                         patch_merge_type: str = "spatial_unpad"):
    """Flatten per-frame projected features into the single spliceable
    stream (llava_arch.py:289-352 video branch). proj_feats [T, P, D]
    (already through the projector, like encode_images), newline the
    LM-dim image_newline parameter. add_faster_video is a dormant
    training knob and is not implemented."""
    x = (pool_2d(proj_feats, stride, pool_mode)
         if stride and stride > 1 else proj_feats)
    d = x.shape[-1]
    if newline_position == "grid":
        return add_token_per_grid(x, newline)
    if newline_position == "frame":
        return add_token_per_frame(x, newline).reshape(-1, d)
    if newline_position == "one_token":
        flat = x.reshape(-1, d)
        if "unpad" in patch_merge_type:
            import jax.numpy as jnp
            flat = jnp.concatenate(
                [flat, newline.astype(flat.dtype)[None]], axis=0)
        return flat
    if newline_position == "no_token":
        return x.reshape(-1, d)
    raise ValueError(f"Unexpected mm_newline_position: {newline_position}")
