"""Image I/O and display-orientation transforms.

The framework's canonical image layout is ``img[x, y, rgba]`` with x = screen
column, y = screen row from the top — the reference's column-major screen
buffer (pixel id x*SCR_HEIGHT + y, kernel.cu:25).

The reference's saved PNGs go through extra display plumbing
(transformSScreenVec4toFloat myApp.cu:1661-1688 -> GL point raster ->
glReadPixels + vertical flip, myApp.cu:1942-1956), which amounts to:

  * VRC / a1: a 180° rotation about Z in NDC (myApp.cu:933)  =>
      png[row r][col c] ~= img[W - c][r]  (±1 px point-raster offset)
  * TEST / a5: identity rotate (myApp.cu:1033)               =>
      png[row r][col c] ~= img[c][H - 1 - r]

:func:`to_display` applies the matching orientation so saved PNGs are
directly comparable with the reference's image_output/ goldens.
"""

from __future__ import annotations

import numpy as np

from .config import Algorithm


def to_uint8(img) -> np.ndarray:
    arr = np.asarray(img)
    return np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)


def to_display(img, algorithm: Algorithm = Algorithm.VRC) -> np.ndarray:
    """[W, H, C] canonical image -> [H, W, C] top-down display array."""
    arr = np.asarray(img)
    if algorithm is Algorithm.VRC:
        # png[r][c] = img[W-1-c][r] (180° rotate; -1 accounts for raster offset)
        return arr[::-1, :, :].transpose(1, 0, 2)
    # identity rotate: png[r][c] = img[c][H-1-r]
    return arr[:, ::-1, :].transpose(1, 0, 2)


def from_display(arr, algorithm: Algorithm = Algorithm.VRC) -> np.ndarray:
    """Inverse of :func:`to_display` — [H, W, C] -> canonical [W, H, C]."""
    arr = np.asarray(arr)
    if algorithm is Algorithm.VRC:
        return arr.transpose(1, 0, 2)[::-1, :, :]
    return arr.transpose(1, 0, 2)[:, ::-1, :]


def save_png(path, img, algorithm: Algorithm = Algorithm.VRC) -> None:
    """Save a canonical [W, H, 3/4] float image as PNG in display orientation."""
    from PIL import Image

    disp = to_uint8(to_display(img, algorithm))
    if disp.shape[-1] == 4:
        disp = disp[..., :3]
    Image.fromarray(disp, mode="RGB").save(path)


def load_png(path) -> np.ndarray:
    """Load a PNG as float [H, W, 3] in [0, 1] (display orientation)."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return arr
