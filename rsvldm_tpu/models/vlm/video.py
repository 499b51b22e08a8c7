"""Video-frame sampling for VLM inputs.

Parity target: /root/reference llava/train/train.py:1170-1205 — the
frame-folder branch ("shareVideoGPTV": sorted frame files, uniform
linspace sampling at an assumed 2 fps, optional time-instruction text).
The decord/pyav container path is descoped (libraries absent here and the
SR pipeline has no video modality); frame folders need only PIL.
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


def time_instruction(video_time: float, num_frames: int,
                     frame_time: str) -> str:
    """The add_time_instruction prefix (train.py:1199-1201), verbatim
    format."""
    return (f"The video lasts for {video_time:.2f} seconds, and "
            f"{num_frames} frames are uniformly sampled from it. These "
            f"frames are located at {frame_time}.Please answer the "
            f"following questions related to this video.")
