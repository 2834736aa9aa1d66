"""Image I/O and the exact training-time decode semantics.

File formats match the reference data layer (rnb_neus2/image_io.py):
PNG 8/16-bit normalized to [0,1]; EXR float passthrough; BGR↔RGB swaps.

Training decode (what the engine does with a 16-bit RGBA texel, verified at
common_device.cuh:665-690 + testbed_nerf.cu:1504-1535):

    rgb_premul = srgb_to_linear(raw/65535) · alpha        (read_rgba)
    value      = linear_to_srgb(rgb_premul)               (loss kernel)

Inside the mask (alpha = 1) this is an exact round-trip (value = raw);
outside it collapses to 0. Normals then map v → 2v−1 with y,z negated and
are normalized; the all-masked pixel becomes (−1,−1,−1)/√3.
"""

from __future__ import annotations

import os

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import numpy as np

try:
    import cv2
    HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAVE_CV2 = False


# ---------------------------------------------------------------------------
# color space
# ---------------------------------------------------------------------------

def srgb_to_linear(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    return np.where(x <= 0.04045, x / 12.92,
                    ((x + 0.055) / 1.055) ** 2.4).astype(np.float32)


def linear_to_srgb(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    return np.where(x < 0.0031308, 12.92 * x,
                    1.055 * np.clip(x, 0, None) ** 0.41666 - 0.055
                    ).astype(np.float32)


def decode_texel(rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """raw [0,1] rgb + alpha → the value the loss kernel sees."""
    return linear_to_srgb(srgb_to_linear(rgb) * alpha[..., None])


def decode_normal(rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """→ unit world..cam-frame normal with the reference's y/z negation
    (testbed_nerf.cu:1507-1510)."""
    n = decode_texel(rgb, alpha) * 2.0 - 1.0
    n[..., 1] *= -1.0
    n[..., 2] *= -1.0
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(norm, 1e-12)).astype(np.float32)


# ---------------------------------------------------------------------------
# file I/O (API-compatible with the reference's python package)
# ---------------------------------------------------------------------------

def load_image(path) -> np.ndarray:
    """PNG 8/16-bit → [0,1] float32; EXR float passthrough; RGB(A) order."""
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(f"Cannot read image: {path}")
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    elif img.dtype != np.float32:
        raise ValueError(f"Unsupported dtype {img.dtype} in {path}")
    if img.ndim == 3 and img.shape[2] == 4:
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    elif img.ndim == 3 and img.shape[2] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def load_image_raw16(path) -> np.ndarray:
    """16-bit RGBA exactly as the engine's stbi_load_16 sees it:
    (H, W, 4) uint16, 8-bit inputs upscaled by 257."""
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(f"Cannot read image: {path}")
    if img.dtype == np.uint8:
        img = img.astype(np.uint16) * 257
    elif img.dtype == np.float32:
        img = np.clip(img, 0, 1)
        img = (img * 65535.0 + 0.5).astype(np.uint16)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[2] == 3:
        alpha = np.full(img.shape[:2] + (1,), 65535, np.uint16)
        img = np.concatenate([img, alpha], axis=-1)
    # BGR(A) → RGB(A)
    img = img[:, :, [2, 1, 0, 3]]
    return img


def save_image(image: np.ndarray, path, bit_depth: int = 16) -> None:
    image = np.nan_to_num(np.asarray(image, np.float32), nan=0.0)
    image = np.clip(image, 0.0, 1.0) * float(2 ** bit_depth - 1)
    image = image.astype(np.uint8 if bit_depth == 8 else np.uint16)
    if image.ndim == 3 and image.shape[2] == 4:
        image = cv2.cvtColor(image, cv2.COLOR_RGBA2BGRA)
    elif image.ndim == 3 and image.shape[2] == 3:
        image = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
    cv2.imwrite(str(path), image, [cv2.IMWRITE_PNG_COMPRESSION, 0])


def save_exr(image: np.ndarray, path) -> None:
    image = np.asarray(image, np.float32)
    if image.ndim == 3 and image.shape[2] >= 3:
        image = image[:, :, ::-1].copy()
    cv2.imwrite(str(path), image,
                [cv2.IMWRITE_EXR_TYPE, cv2.IMWRITE_EXR_TYPE_FLOAT])


def load_normal(path) -> np.ndarray:
    """Normal map in [−1,1]: EXR as-is, PNG remapped from [0,1]."""
    ext = os.path.splitext(str(path))[1].lower()
    img = load_image(path)
    if img.ndim == 3 and img.shape[2] > 3:
        img = img[:, :, :3]
    return img if ext == ".exr" else img * 2.0 - 1.0


def save_normal_16bit(normal: np.ndarray, path) -> None:
    save_image(0.5 * (1.0 + np.asarray(normal)), path, bit_depth=16)
