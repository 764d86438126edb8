"""Video / frame I/O (host side).

Parity surface: the reference's utils/io.py (frame-folder reader, grid GIF
writer) and test.py's decord/PIL decode (/root/reference/test.py:85-99,
live2diff/utils/io.py:12-48). Uses imageio when available (mp4/gif), PIL as
the fallback; decode stays on CPU and feeds device_put.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np
from PIL import Image


def _numeric_key(name: str):
    nums = re.findall(r"\d+", name)
    return (int(nums[-1]) if nums else 0, name)


def read_video_frames(path: str, max_frames: Optional[int] = None) -> List[np.ndarray]:
    """Read frames as uint8 [H, W, 3] arrays from a video file, GIF, or a
    directory of numbered images."""
    frames: List[np.ndarray] = []
    if os.path.isdir(path):
        names = sorted(
            (n for n in os.listdir(path)
             if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp"))),
            key=_numeric_key,
        )
        for n in names:
            frames.append(np.asarray(Image.open(os.path.join(path, n)).convert("RGB")))
            if max_frames and len(frames) >= max_frames:
                break
        return frames

    if path.lower().endswith(".gif"):
        img = Image.open(path)
        try:
            while True:
                frames.append(np.asarray(img.convert("RGB")))
                if max_frames and len(frames) >= max_frames:
                    break
                img.seek(img.tell() + 1)
        except EOFError:
            pass
        return frames

    try:
        import imageio.v3 as iio

        for i, frame in enumerate(iio.imiter(path)):
            frames.append(np.asarray(frame)[..., :3])
            if max_frames and len(frames) >= max_frames:
                break
        return frames
    except Exception as e:  # pragma: no cover - depends on codecs present
        raise RuntimeError(f"cannot decode video {path}: {e}") from e


def write_video(path: str, frames: np.ndarray, fps: int = 16) -> None:
    """Write [N, H, W, 3] uint8 frames to mp4/gif (imageio) or a PNG folder."""
    frames = np.asarray(frames)
    if path.lower().endswith(".gif"):
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=max(1, int(1000 / fps)), loop=0)
        return
    if os.path.splitext(path)[1] == "" or path.endswith(os.sep):
        os.makedirs(path, exist_ok=True)
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(path, f"{i:06d}.png"))
        return
    try:
        import imageio.v3 as iio

        iio.imwrite(path, frames, fps=fps)
    except Exception:
        # codec fallback: write a PNG folder next to the requested path
        folder = os.path.splitext(path)[0] + "_frames"
        os.makedirs(folder, exist_ok=True)
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(folder, f"{i:06d}.png"))


def save_videos_grid(frames_list: List[np.ndarray], path: str, fps: int = 16) -> None:
    """Stack multiple [N,H,W,3] clips side-by-side and save (grid GIF writer)."""
    n = min(len(f) for f in frames_list)
    grid = np.concatenate([np.asarray(f[:n]) for f in frames_list], axis=2)
    write_video(path, grid, fps=fps)
