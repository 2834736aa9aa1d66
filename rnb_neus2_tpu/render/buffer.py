"""Render buffer: sample accumulation + tonemapping (headless).

TPU-native equivalent of the reference's CudaRenderBuffer
(src/render_buffer.cu:217-332, include/…/render_buffer.h): progressive
multi-sample accumulation into a float buffer, then a tonemap pipeline —
1) decode to linear, 2) exposure in linear space (×2^exposure),
3) tonemap curve (Identity / ACES / Hable / Reinhard,
   render_buffer.cu:254-310), 4) encode to the output color space.

The reference's buffer lives GPU-side feeding the GUI/DLSS; here it is a
small functional jnp module feeding screenshots/video frames — the GUI
itself is out of scope (the RNb pipeline always runs --no-gui) but the
image-formation capability is kept.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp

from ..io.image_io import linear_to_srgb, srgb_to_linear


class ColorSpace(enum.Enum):        # common.h:126-130
    LINEAR = "linear"
    SRGB = "srgb"


class TonemapCurve(enum.Enum):      # common.h:133-138
    IDENTITY = "identity"
    ACES = "aces"
    HABLE = "hable"
    REINHARD = "reinhard"


def _tonemap_curve(x: jnp.ndarray, curve: TonemapCurve) -> jnp.ndarray:
    """Rational-polynomial tonemap curves, constants bit-matched to
    render_buffer.cu:254-310:

    - ACES folds a 0.6 pre-exposure cancellation into the fitted
      constants (k0 = 0.6²·2.51, k1 = 0.6·0.03, ...);
    - Hable folds a 2× exposure bias and the W=11.2 white scale into the
      rational coefficients (k0·4·white_scale, k1·2·white_scale, ...);
    - Reinhard is luminance-based x/(Y+1) with Rec.709 weights, applied
      per pixel (NOT per channel)."""
    if curve == TonemapCurve.IDENTITY:
        return x
    x = jnp.maximum(x, 0.0)
    if curve == TonemapCurve.ACES:
        k0 = 0.6 * 0.6 * 2.51
        k1 = 0.6 * 0.03
        k2 = 0.0
        k3 = 0.6 * 0.6 * 2.43
        k4 = 0.6 * 0.59
        k5 = 0.14
    elif curve == TonemapCurve.HABLE:
        A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        k0 = A * F - A * E
        k1 = C * B * F - B * E
        k2 = 0.0
        k3 = A * F
        k4 = B * F
        k5 = D * F * F
        w = 11.2
        white_scale = (k3 * w * w + k4 * w + k5) / (k0 * w * w + k1 * w + k2)
        k0 = 4.0 * k0 * white_scale
        k1 = 2.0 * k1 * white_scale
        k2 = k2 * white_scale
        k3 = 4.0 * k3
        k4 = 2.0 * k4
    else:  # REINHARD: x / (dot(lum, x) + 1), Rec.709 luminance
        lum = jnp.asarray([0.2126, 0.7152, 0.0722], x.dtype)
        y = jnp.sum(x * lum, axis=-1, keepdims=True)
        return x / (y + 1.0)
    sq = x * x
    return (sq * k0 + k1 * x + k2) / (k3 * sq + k4 * x + k5)


def tonemap(color: jnp.ndarray, exposure: float = 0.0,
            curve: TonemapCurve = TonemapCurve.IDENTITY,
            color_space: ColorSpace = ColorSpace.LINEAR,
            output_color_space: ColorSpace = ColorSpace.SRGB) -> jnp.ndarray:
    """Full tonemap pipeline (render_buffer.cu:313-332).

    color: (..., 3) in `color_space`; returns (..., 3) in
    `output_color_space`.
    """
    x = color
    if color_space == ColorSpace.SRGB:
        x = srgb_to_linear(x)
    x = x * (2.0 ** exposure)
    x = _tonemap_curve(x, curve)
    if output_color_space == ColorSpace.SRGB:
        x = linear_to_srgb(jnp.clip(x, 0.0, 1.0))
    return x


@dataclasses.dataclass
class RenderBuffer:
    """Progressive accumulation buffer (render_buffer.cu accumulate_kernel).

    accumulate() folds a new frame into the running mean:
      acc ← acc + (frame − acc) / (spp + 1)
    matching the reference's sample_count-weighted blend
    (render_buffer.cu:217-251). Accumulation happens in the buffer's
    color space (the reference accumulates linear for Linear/VisPosNeg and
    sRGB-warped otherwise; we accumulate linear).
    """
    accumulation: jnp.ndarray           # (H, W, 4) linear RGBA
    spp: int = 0

    @classmethod
    def create(cls, width: int, height: int) -> "RenderBuffer":
        return cls(jnp.zeros((height, width, 4), jnp.float32), 0)

    def clear(self) -> "RenderBuffer":
        return RenderBuffer(jnp.zeros_like(self.accumulation), 0)

    def accumulate(self, frame: jnp.ndarray) -> "RenderBuffer":
        """frame: (H, W, 4) linear RGBA for this sample pass."""
        acc = self.accumulation
        acc = acc + (frame - acc) / (self.spp + 1)
        return RenderBuffer(acc, self.spp + 1)

    def tonemapped(self, exposure: float = 0.0,
                   curve: TonemapCurve = TonemapCurve.IDENTITY,
                   output_color_space: ColorSpace = ColorSpace.SRGB
                   ) -> jnp.ndarray:
        """(H, W, 4) display image; alpha passes through untouched."""
        rgb = tonemap(self.accumulation[..., :3], exposure, curve,
                      ColorSpace.LINEAR, output_color_space)
        return jnp.concatenate([rgb, self.accumulation[..., 3:]], axis=-1)
