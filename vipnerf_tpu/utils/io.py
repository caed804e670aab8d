"""Image/array/video I/O helpers.

The reference uses skimage.io / skimage.transform / skvideo+ffmpeg; this
environment ships imageio + OpenCV instead, so all I/O funnels through here.
Semantics match the reference helpers:
- save_image / save_numpy_array: src/Trainer01.py:383-409 (png normalization
  of arrays by their max, .npy + optional .png dump)
- read_mask: binary png == 255 (src/data_loaders/NerfLlffDataLoader01.py:174-182)
- video writer: 15 fps mp4 (src/NerfLlffTrainerTester01.py:29-38), via
  cv2.VideoWriter since no ffmpeg binary exists here.
"""

from pathlib import Path
from typing import Optional

import imageio.v2 as imageio
import numpy as np


def read_image(path) -> np.ndarray:
    return np.asarray(imageio.imread(Path(path).as_posix()))


def read_mask(path) -> np.ndarray:
    return read_image(path) == 255


def save_image(path, image: np.ndarray):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if isinstance(image.flat[0], np.floating):
        image = np.round(image * 255).astype("uint8")
    if path.suffix == ".png":
        imageio.imwrite(path.as_posix(), image)
    elif path.suffix == ".npy":
        np.save(path.as_posix(), image)
    else:
        raise RuntimeError(f"Unknown image format: {path.as_posix()}")


def save_numpy_array(path, data_array: np.ndarray, as_png: bool = False):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    max_val = data_array.max()
    denom = max_val if max_val > 0 else 1
    data_image = np.round(data_array / denom * 255).astype("uint8")
    if path.suffix == ".png":
        imageio.imwrite(path.as_posix(), data_image)
    elif path.suffix == ".npy":
        np.save(path.as_posix(), data_array)
        if as_png:
            imageio.imwrite((path.parent / f"{path.stem}.png").as_posix(), data_image)
    else:
        raise RuntimeError(f"Unknown data format: {path.as_posix()}")


def rescale_image(
    image: np.ndarray, downsampling_factor: float, *, anti_aliasing: bool = True
) -> np.ndarray:
    """Downscale by `downsampling_factor` (reference uses skimage rescale;
    cv2 INTER_AREA is the anti-aliased equivalent for downsampling)."""
    import cv2

    h, w = image.shape[:2]
    new_w = int(w / downsampling_factor)
    new_h = int(h / downsampling_factor)
    interp = cv2.INTER_AREA if anti_aliasing else cv2.INTER_LINEAR
    out = cv2.resize(image.astype(np.float32), (new_w, new_h), interpolation=interp)
    return out


def save_video(path, frames: np.ndarray, fps: int = 15) -> Optional[Path]:
    """Write (t, h, w, 3) uint8 frames to mp4 (reference save_video,
    src/NerfLlffTrainerTester01.py:29-38). Falls back to a frames directory if
    no codec is available; returns the written path or None."""
    import cv2

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    t, h, w = frames.shape[:3]
    writer = cv2.VideoWriter(
        path.as_posix(), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if writer.isOpened():
        for frame in frames:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        writer.release()
        return path
    # Codec unavailable: dump frames instead
    frames_dir = path.parent / (path.stem + "_frames")
    frames_dir.mkdir(parents=True, exist_ok=True)
    for i, frame in enumerate(frames):
        imageio.imwrite((frames_dir / f"{i:04}.png").as_posix(), frame)
    return None
