"""Video utilities (reference omni/utils/video_utils.py — frame sampling for
the webvid video-text datasets).

decord/cv2 aren't in this image; supported sources: animated GIF/WebP via
PIL, or a directory of frame images. Returns uniformly sampled RGB frames.
"""

from __future__ import annotations

import os

import numpy as np


def sample_video_frames(path: str, num_frames: int = 8) -> np.ndarray:
    """→ [num_frames, H, W, 3] uint8, uniformly sampled."""
    if os.path.isdir(path):
        frames = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        if not frames:
            raise ValueError(f"no frame images in {path}")
        idx = np.linspace(0, len(frames) - 1, num_frames).astype(int)
        from PIL import Image

        return np.stack([
            np.asarray(Image.open(frames[i]).convert("RGB")) for i in idx
        ])

    from PIL import Image, ImageSequence

    img = Image.open(path)
    frames = [f.convert("RGB") for f in ImageSequence.Iterator(img)]
    if not frames:
        raise ValueError(f"no frames in {path}")
    idx = np.linspace(0, len(frames) - 1, num_frames).astype(int)
    return np.stack([np.asarray(frames[i]) for i in idx])
