"""Host-side image pre/post-processing.

Equivalent surface to the reference's VaeImageProcessor use and
``postprocess_image`` (/root/reference/live2diff/image_utils.py:40-89):
resize + centre-crop to target, [0,1] -> [-1,1], and the inverse with
``output_type`` dispatch (pil / np / pt-like float array / latent).
Channels-last throughout.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np
from PIL import Image


def preprocess_image(
    image: Union[Image.Image, np.ndarray], height: int, width: int
) -> np.ndarray:
    """-> float32 [H, W, 3] in [-1, 1], resized + centre-cropped."""
    if isinstance(image, Image.Image):
        img = image.convert("RGB")
        scale = max(width / img.width, height / img.height)
        img = img.resize(
            (round(img.width * scale), round(img.height * scale)), Image.BILINEAR
        )
        left = (img.width - width) // 2
        top = (img.height - height) // 2
        img = img.crop((left, top, left + width, top + height))
        arr = np.asarray(img, dtype=np.float32) / 255.0
    else:
        arr = np.asarray(image, dtype=np.float32)
        if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
            arr = np.transpose(arr, (1, 2, 0))  # CHW -> HWC
        if arr.max() > 2.0:
            arr = arr / 255.0
        if arr.shape[:2] != (height, width):
            arr = np.asarray(
                Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).resize(
                    (width, height), Image.BILINEAR
                ),
                dtype=np.float32,
            ) / 255.0
    return arr * 2.0 - 1.0


def postprocess_image(
    image: np.ndarray, output_type: str = "pil"
) -> Union[List[Image.Image], np.ndarray]:
    """[-1,1] float OR device-side uint8 [B?, H, W, 3] -> requested type.

    uint8 input (StreamConfig.output_uint8 pipelines) is already [0,255]:
    no host-side clip/scale pass is needed.
    """
    arr = np.asarray(image)
    if output_type == "latent":
        return arr if arr.dtype == np.uint8 else arr.astype(np.float32)
    squeeze = arr.ndim == 3
    if squeeze:
        arr = arr[None]
    if arr.dtype == np.uint8:
        uint8 = arr
        if output_type == "pt":
            pt = uint8.astype(np.float32) / 255.0
            return pt[0] if squeeze else pt
    else:
        arrf = (np.clip(arr.astype(np.float32), -1.0, 1.0) + 1.0) / 2.0
        if output_type == "pt":
            return arrf[0] if squeeze else arrf
        uint8 = (arrf * 255).round().astype(np.uint8)
    if output_type == "np":
        return uint8[0] if squeeze else uint8
    pils = [Image.fromarray(frame) for frame in uint8]
    return pils[0] if squeeze else pils


def frames_to_uint8(frames: Sequence[np.ndarray]) -> np.ndarray:
    """List of [-1,1] (or device uint8) frames -> [N, H, W, 3] uint8 video."""
    arrs = [np.asarray(f) for f in frames]
    if all(a.dtype == np.uint8 for a in arrs):
        return np.stack(arrs)
    out = np.stack([a.astype(np.float32) for a in arrs])
    return ((np.clip(out, -1, 1) + 1) * 127.5).round().astype(np.uint8)
