"""SAR-scan sweep animation — headless equivalent of ``xp_sar_demo.py``.

The reference renders a GLSL fragment shader in an Ursina window: a bright
scan beam sweeps across an image; ahead of the beam the scene is coarsely
pixelated (unresolved), behind it fully resolved (:17-148). Here the same
effect is a pure-array frame generator (usable on any image, e.g. a focused
SAR product) plus GIF assembly — no GPU/window required.
"""

from __future__ import annotations

import numpy as np


def _pixelate(img: np.ndarray, block: int) -> np.ndarray:
    """Coarse block-average pixelation."""
    h, w = img.shape[:2]
    hb, wb = max(1, h // block), max(1, w // block)
    ys = (np.arange(h) * hb // h) * (h // hb)
    xs = (np.arange(w) * wb // w) * (w // wb)
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    return img[np.ix_(ys, xs)]


def scan_frames(image: np.ndarray, num_frames: int = 40, block: int = 16,
                axis: int = 1, beam_width: int = 4,
                beam_color=(0.2, 1.0, 0.3)) -> np.ndarray:
    """(F, H, W, 3) uint8 sweep animation over ``image`` (H, W[, 3]),
    values in [0, 1] or uint8."""
    img = np.asarray(image, np.float64)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    if img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape[:2]
    coarse = _pixelate(img, block)
    n_cols = img.shape[axis]
    frames = np.empty((num_frames, h, w, 3), np.uint8)
    for f in range(num_frames):
        pos = int((f + 1) / num_frames * n_cols)
        out = coarse.copy()
        if axis == 1:
            out[:, :pos] = img[:, :pos]
            b0, b1 = max(0, pos - beam_width), min(w, pos + beam_width)
            out[:, b0:b1] = (0.35 * out[:, b0:b1]
                             + 0.65 * np.asarray(beam_color))
        else:
            out[:pos] = img[:pos]
            b0, b1 = max(0, pos - beam_width), min(h, pos + beam_width)
            out[b0:b1] = 0.35 * out[b0:b1] + 0.65 * np.asarray(beam_color)
        frames[f] = np.clip(out * 255.0, 0, 255).astype(np.uint8)
    return frames


def save_scan_gif(path: str, image: np.ndarray, fps: float = 15.0, **kw):
    """Render the sweep over ``image`` straight to a GIF."""
    from PIL import Image
    frames = scan_frames(image, **kw)
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path
