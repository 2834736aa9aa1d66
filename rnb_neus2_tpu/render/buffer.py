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
    """Rational-polynomial tonemap curves (render_buffer.cu:254-310).

    All three non-identity curves are expressed as (x(ax+b))/(x(cx+d)+e)
    with the published constants (ACES fitted; Hable aka Uncharted2 filmic
    with white scale folded in; Reinhard x/(1+x))."""
    if curve == TonemapCurve.IDENTITY:
        return x
    if curve == TonemapCurve.ACES:
        a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    elif curve == TonemapCurve.HABLE:
        A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        w = 11.2
        white = ((w * (A * w + C * B) + D * E) / (w * (A * w + B) + D * F)
                 - E / F)
        def hable(v):
            return ((v * (A * v + C * B) + D * E)
                    / (v * (A * v + B) + D * F) - E / F)
        return jnp.clip(hable(x) / white, 0.0, 1.0)
    else:  # REINHARD
        a, b, c, d, e = 1.0, 0.0, 0.0, 1.0, 1.0
    y = (x * (a * x + b)) / (x * (c * x + d) + e)
    return jnp.clip(y, 0.0, 1.0)


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
