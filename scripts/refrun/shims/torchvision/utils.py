"""Shimmed torchvision.utils.save_image (imported by the reference's
utils.py:7; no runtime call sites in the trainer paths we drive)."""
from __future__ import annotations

import numpy as np


def save_image(tensor, fp, **_unused):
    import imageio
    arr = tensor.detach().cpu().numpy()
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 3 and arr.shape[0] in (1, 3, 4):
        arr = np.moveaxis(arr, 0, -1)
    arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    imageio.imwrite(fp, arr)
