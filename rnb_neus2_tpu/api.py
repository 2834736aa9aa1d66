"""High-level Python API — the pyngp-module equivalent
(src/python_api.cu:219-616).

The reference exposes a pybind11 `Testbed` with: construction by mode,
load_training_data, frame/train loops, render_to_cpu, snapshot save/load,
compute_marching_cubes_mesh → {V, N, C, F}, calculate_iou, screenshot
helpers, n_params, loss scalars and the mode enums. This module offers the
same surface over the JAX implementation.

>>> import rnb_neus2_tpu.api as ngp
>>> tb = ngp.Testbed(ngp.TestbedMode.Nerf)
>>> tb.load_training_data("scene_dir/")
>>> while tb.frame(): ...
>>> mesh = tb.compute_marching_cubes_mesh(resolution=(512,)*3)
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Optional, Tuple

import numpy as np
import jax


class TestbedMode(enum.Enum):
    """ETestbedMode (common.h:153). The RNb pipeline always uses Nerf; the
    inherited instant-ngp workloads are provided by models/ extras."""

    Nerf = "nerf"
    Sdf = "sdf"
    Image = "image"
    Volume = "volume"


class _ExtraModeDriver:
    """Drives the inherited instant-ngp workloads (Image/Sdf/Volume,
    models/extra_modes.py) through the Testbed facade verbs, mirroring
    how pyngp exposes every ETestbedMode through one class
    (python_api.cu:219-616, common.h:153)."""

    def __init__(self, mode: "TestbedMode"):
        from .models import extra_modes as em

        self.mode = mode
        self.field = {TestbedMode.Image: em.ImageField,
                      TestbedMode.Sdf: em.SdfField,
                      TestbedMode.Volume: em.VolumeField}[mode]()
        self.params = None
        self.state = None
        self.step = 0
        self.loss = 0.0
        self._data = None

    def load(self, source) -> None:
        """source: image path/array (Image), mesh path/(V,F) (Sdf),
        volume path/.npy array (Volume) — the same per-mode dispatch as
        Testbed::load_training_data (testbed.cu load_file by mode)."""
        import numpy as np

        if self.mode == TestbedMode.Image:
            if isinstance(source, (str, os.PathLike)):
                from .io.image_io import load_image
                source = load_image(str(source))[..., :3]
            self._data = (np.asarray(source, np.float32),)
        elif self.mode == TestbedMode.Sdf:
            if isinstance(source, (str, os.PathLike)):
                from .mesh.writer import load_obj
                source = load_obj(str(source))
            self._data = (np.asarray(source[0], np.float32),
                          np.asarray(source[1]))
        else:
            if isinstance(source, (str, os.PathLike)):
                source = np.load(str(source))
            self._data = (np.asarray(source, np.float32),)

    def train(self, n_steps: int) -> None:
        assert self._data is not None, "load_training_data first"
        out = self.field.fit(*self._data, n_steps=n_steps,
                             seed=self.step, params=self.params,
                             state=self.state, return_state=True)
        self.params, self.state, self.loss = out
        self.step += n_steps

    def render(self, W: int = 0, H: int = 0):
        import numpy as np

        if self.mode == TestbedMode.Image:
            img = self._data[0]
            H = H or img.shape[0]
            W = W or img.shape[1]
            return self.field.render(self.params, W, H)
        # Sdf: sphere-traced BRDF shade (testbed_sdf.cu render path);
        # Volume: ratio-tracked density compositor (testbed_volume.cu)
        assert self.params is not None, "train first"
        return self.field.render(self.params, W=W or 256, H=H or 256)


class Testbed:
    """Facade over Trainer + renderer + mesh extraction."""

    def __init__(self, mode: TestbedMode = TestbedMode.Nerf,
                 config: Optional[object] = None):
        from .config import TestbedConfig

        self.mode = mode
        self.cfg = config or TestbedConfig()
        self.max_iter = self.cfg.train.max_steps
        self._trainer = None
        self._dataset = None
        self.shall_train = True
        self.background_color = (1.0, 1.0, 1.0, 1.0)
        # optional lat-long RGBA background texture (render/envmap.py,
        # reference envmap.cuh); None = constant background_color
        self.envmap = None
        # non-Nerf workloads (ETestbedMode, common.h:153) are driven by
        # the models/extra_modes fields through the same facade verbs
        # (load_training_data / frame / train / render_to_cpu /
        # calculate_iou), mirroring pyngp (python_api.cu:219-616)
        self._extra = None if mode == TestbedMode.Nerf \
            else _ExtraModeDriver(mode)

    # -- data ----------------------------------------------------------------

    def load_training_data(self, source) -> None:
        if self._extra is not None:
            self._extra.load(source)
            return
        from .io.dataset import load_transform_json
        from .train.trainer import Trainer

        self._dataset = load_transform_json(str(source))
        self._trainer = Trainer(self._dataset, self.cfg)

    def set_camera_intrinsics(self, frame_idx: int, fx: float = 0.0,
                              fy: float = 0.0, cx: float = -0.5,
                              cy: float = -0.5, k1: float = 0.0,
                              k2: float = 0.0, p1: float = 0.0,
                              p2: float = 0.0) -> None:
        """Override one view's intrinsics + OpenCV distortion
        (pyngp Testbed.nerf.training.set_camera_intrinsics,
        python_api.cu:557-563 → testbed_nerf.cu:2915-2930). Like the
        reference: a non-positive focal falls back to the other axis, a
        negative cx/cy is interpreted as already-normalized |cx|, and any
        nonzero distortion coefficient enables the Iterative model."""
        import numpy as np
        import jax.numpy as jnp
        if self._dataset is None:
            raise RuntimeError("load_training_data first")
        cams = self._dataset.cameras
        n = cams.rot_c2w.shape[0]
        if not (0 <= frame_idx < n):
            return
        W, H = cams.resolution
        if fx <= 0.0:
            fx = fy
        if fy <= 0.0:
            fy = fx
        cx = -cx if cx < 0.0 else cx / W
        cy = -cy if cy < 0.0 else cy / H
        focal = np.array(cams.focal)
        pp = np.array(cams.principal)
        focal[frame_idx] = (fx, fy)
        pp[frame_idx] = (cx, cy)
        dist = (np.array(cams.distortion) if cams.distortion is not None
                else np.zeros((n, 4), np.float32))
        dist[frame_idx] = (k1, k2, p1, p2)
        cams = cams._replace(
            focal=jnp.asarray(focal), principal=jnp.asarray(pp),
            distortion=jnp.asarray(dist) if np.any(dist) else None)
        self._dataset.cameras = cams
        if self._trainer is not None:
            # compiled step fns close over the old camera arrays as
            # constants — they must be rebuilt against the new intrinsics
            self._trainer.dataset = self._dataset
            self._trainer._compiled.clear()

    def reload_network_from_file(self, path: str = "") -> None:
        from .config import TestbedConfig
        from .train.trainer import Trainer

        if path:
            self.cfg = TestbedConfig.from_network_json(path)
        if self._dataset is not None:
            self._trainer = Trainer(self._dataset, self.cfg)

    # -- training -------------------------------------------------------------

    def frame(self) -> bool:
        """One training step; False once max_iter is reached
        (Testbed::frame, testbed.cu:1826-1919)."""
        if not self.shall_train or self.training_step >= self.max_iter:
            return False
        if self._extra is not None:
            self._extra.train(1)
        else:
            self._trainer.train_step()
        return True

    def train(self, n_steps: int) -> None:
        if self._extra is not None:
            self._extra.train(n_steps)
            return
        for _ in range(n_steps):
            self._trainer.train_step()

    @property
    def training_step(self) -> int:
        if self._extra is not None:
            return self._extra.step
        return self._trainer.step if self._trainer else 0

    @property
    def loss(self) -> float:
        if self._extra is not None:
            return self._extra.loss
        return self._trainer.loss_ema.value if self._trainer else 0.0

    @property
    def ek_loss(self) -> float:
        return self._trainer.ek_ema.value if self._trainer else 0.0

    @property
    def mask_loss(self) -> float:
        return self._trainer.mask_ema.value if self._trainer else 0.0

    def n_params(self) -> int:
        return sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(self._trainer.params))

    def set_max_iter(self, n: int) -> None:
        self.max_iter = n

    # -- rendering -------------------------------------------------------------

    def render_to_cpu(self, view_idx: int = 0, max_samples: int = 256,
                      W: int = 0, H: int = 0) -> np.ndarray:
        """Render a training view → (H, W, 4) float RGBA. W/H override
        the output size for the extra modes (pyngp render(width, height),
        python_api.cu)."""
        if self._extra is not None:
            return self._extra.render(W, H)
        from .render.renderer import render_view

        out = render_view(self._trainer.field,
                          self._trainer.inference_params,
                          self._dataset.cameras, view_idx,
                          self._trainer.occ.bitfield,
                          self.cfg.march, max_samples=max_samples,
                          background=self.background_color[:3],
                          envmap=self.envmap)
        return np.concatenate([out["albedo"], out["alpha"][..., None]],
                              axis=-1)

    def screenshot(self, path: str, view_idx: int = 0) -> None:
        from .io.image_io import save_image

        save_image(self.render_to_cpu(view_idx), path, bit_depth=8)

    def render_path(self, camera_path, n_frames: int,
                    max_samples: int = 256, render_scale: float = 1.0):
        """Render a fly-through along a CameraPath → list of (H, W, 4)
        float RGBA frames (the headless counterpart of the reference's
        camera-path playback, src/camera_path.cu; save with
        io.image_io.save_image per frame for video assembly)."""
        from .render.renderer import render_view

        cams = self._dataset.cameras
        frames = []
        for m in camera_path.frames(n_frames):
            import jax.numpy as jnp
            V = cams.rot_c2w.shape[0]
            cams_m = cams._replace(
                rot_c2w=jnp.broadcast_to(jnp.asarray(m[:3, :3]),
                                         (V, 3, 3)),
                origin=jnp.broadcast_to(jnp.asarray(m[:3, 3]), (V, 3)))
            out = render_view(self._trainer.field,
                              self._trainer.inference_params, cams_m, 0,
                              self._trainer.occ.bitfield, self.cfg.march,
                              max_samples=max_samples,
                              background=self.background_color[:3],
                              envmap=self.envmap,
                              render_scale=render_scale)
            frames.append(np.concatenate(
                [out["albedo"], out["alpha"][..., None]], axis=-1))
        return frames

    # -- mesh -------------------------------------------------------------------

    def compute_marching_cubes_mesh(self, resolution: Tuple[int, int, int]
                                    = (256, 256, 256), thresh: float = 0.0
                                    ) -> dict:
        """→ {"V", "N", "C", "F"} like pyngp (python_api.cu mesh dict)."""
        from .mesh.extract import extract_mesh

        m = extract_mesh(self._trainer.field,
                         self._trainer.inference_params,
                         resolution=int(resolution[0]),
                         meta=self._dataset.meta, thresh=thresh,
                         with_colors=True)
        return {"V": m["V"], "N": m["N"], "C": m["C"], "F": m["F"]}

    def save_mesh(self, path: str, resolution=(256, 256, 256)) -> None:
        from .mesh.writer import save_mesh

        m = self.compute_marching_cubes_mesh(resolution)
        save_mesh(path, m["V"], m["F"], m["N"], m["C"])

    # -- snapshots ----------------------------------------------------------------

    def save_snapshot(self, path: str, include_optimizer: bool = True
                      ) -> None:
        from .train import snapshot as snap

        snap.save_snapshot(path, self._trainer)

    def load_snapshot(self, path: str) -> None:
        from .train import snapshot as snap

        snap.restore_trainer(self._trainer, snap.load_snapshot(path))

    # -- evaluation ------------------------------------------------------------------

    def calculate_iou(self, n_samples: int = 128 ** 3, thresh: float = 0.0,
                      gt_sdf=None, seed: int = 0) -> float:
        """Volumetric IoU between the learned SDF and a ground-truth SDF
        callable over [0,1]³ (Testbed::calculate_iou, testbed.h:378).
        In Sdf mode the GT is the loaded mesh itself."""
        if self._extra is not None:
            assert self.mode == TestbedMode.Sdf, self.mode
            return self._extra.field.calculate_iou(
                min(n_samples, 1 << 15), seed)
        import jax.numpy as jnp

        key = jax.random.PRNGKey(seed)
        pts = jax.random.uniform(key, (n_samples, 3))
        pred = np.asarray(self._trainer.field.sdf(
            self._trainer.inference_params, pts)) < thresh
        if gt_sdf is None:
            raise ValueError("calculate_iou needs a gt_sdf callable")
        gt = np.asarray(gt_sdf(np.asarray(pts))) < thresh
        inter = np.logical_and(pred, gt).sum()
        union = np.logical_or(pred, gt).sum()
        return float(inter) / max(float(union), 1.0)
