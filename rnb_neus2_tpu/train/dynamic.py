"""Multi-frame dynamic-scene training (the NeuS2 capability the RNb fork
inherits; reference flow in src/testbed.cu:2788-2870 + hyperparams in
configs/nerf/base.json: first_frame_max_training_step,
next_frame_max_training_step, predict_global_movement(_training_step),
finetune_global_movement, and the "globalmove" optimizer chain).

Flow reproduced:
- frame 0 trains the canonical field normally;
- each later frame starts by training ONLY the global rigid motion
  (DeltaNetwork) for predict_global_movement_training_step steps with the
  canonical field frozen and all hash levels unlocked
  (encoding set_training_step gets a negative step → full levels,
  grid.h:1430-1436);
- then the canonical resumes training (delta keeps refining when
  finetune_global_movement, else frozen);
- rays are mapped into the canonical frame by the delta transform before
  marching (generate_training_samples…, testbed_nerf.cu:1311-1323);
- the accumulated movement transforms the final mesh
  (transform_mesh_with_6d, testbed_nerf.cu:4316-4326).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TestbedConfig
from ..grid import occupancy
from ..models import delta_network as dn
from ..render.losses import training_loss
from .sampler import sample_ray_batch
from .trainer import Trainer, valid_level_for_step


@dataclasses.dataclass(frozen=True)
class DynamicConfig:
    """hyperparams + globalmove sections (configs/nerf/base.json:77-122)."""

    first_frame_max_training_step: int = 2000
    next_frame_max_training_step: int = 1300
    predict_global_movement: bool = True
    predict_global_movement_training_step: int = 100
    finetune_global_movement: bool = True
    reset_density_grid_after_global_movement: bool = False
    delta_learning_rate: float = 0.005   # globalmove Adam (base.json:106)


class FrameSequenceTrainer:
    """Drives a Trainer across a sequence of per-frame datasets."""

    def __init__(self, first_dataset, cfg: TestbedConfig,
                 dyn: Optional[DynamicConfig] = None):
        self.cfg = cfg
        self.dyn = dyn or DynamicConfig()
        self.trainer = Trainer(first_dataset, cfg)
        self.delta = dn.init_delta_params()
        self.delta_tx = optax.adam(self.dyn.delta_learning_rate,
                                   b1=0.9, b2=0.99, eps=1e-10)
        self.delta_opt = self.delta_tx.init(self.delta)
        # the globalmove chain wraps Adam in an Ema(0.95) — the EMA'd
        # params are what the engine consumes (configs/nerf/base.json
        # "globalmove"); same here
        self.delta_ema = self.delta
        self.frame = 0
        self._delta_step_fns: Dict[Any, Any] = {}

    # ------------------------------------------------------------------

    def train_first_frame(self, n_steps: Optional[int] = None):
        assert self.frame == 0
        self.trainer.train_steps(
            n_steps or self.dyn.first_frame_max_training_step)

    def _delta_step_fn(self, n_rays: int):
        if n_rays in self._delta_step_fns:
            return self._delta_step_fns[n_rays]
        tr = self.trainer
        cfg = self.cfg
        n_slots = cfg.train.target_batch_size
        delta_tx = self.delta_tx
        # the canonical field is frozen in this phase, so the eikonal term
        # (an UNNORMALIZED sum over samples) must not steer the motion —
        # through the sample positions it otherwise rewards transforms
        # that simply shed samples
        loss_cfg = dataclasses.replace(cfg.loss, ek_loss_weight=0.0)

        @jax.jit
        def step_fn(field_params, delta, delta_opt, bitfield, key):
            # march with the CURRENT (stop-grad) transform applied first —
            # the reference transforms rays before the occupancy DDA
            # (testbed_nerf.cu:1311-1323); the sample t-values are then
            # constants and positions stay differentiable in delta.
            frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, delta)
            batch, samples, _, _ = sample_ray_batch(
                tr.dataset, bitfield, key, n_rays, n_slots, cfg.march,
                ray_transform=lambda o, dd: dn.apply_rigid(frozen, o, dd))

            # raw (untransformed) rays recovered by inverting the frozen
            # transform so the differentiable transform can re-apply
            R = dn.rotation_6d_to_matrix(frozen["rotation6d"])
            o_raw = (batch.ray_o - frozen["translation"]) @ R
            d_raw = batch.ray_d @ R

            def loss_fn(d):
                o2, d2 = dn.apply_rigid(d, o_raw, d_raw)
                rid = jnp.minimum(samples.ray_id, n_rays - 1)
                pos = jnp.clip(o2[rid] + samples.t[:, None] * d2[rid],
                               0.0, 1.0)
                # drop the pre-gathered per-sample attrs: they were built
                # from the frozen-transform rays and the differentiable
                # re-transform changes ray_d — the loss re-gathers instead
                batch2 = batch._replace(ray_o=o2, ray_d=d2,
                                        sample_attrs=None)
                out = tr.field.apply(field_params, pos,
                                     valid_level=None,
                                     differentiable_positions=True)
                return training_loss(out, samples, batch2, cfg.flags,
                                     loss_cfg, 1.0)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(delta)
            up, delta_opt = delta_tx.update(grads, delta_opt, delta)
            delta = optax.apply_updates(delta, up)
            metrics = dict(metrics)
            metrics.pop("_per_ray_color_logged", None)
            return delta, delta_opt, loss, metrics

        self._delta_step_fns[n_rays] = step_fn
        return step_fn

    def advance_frame(self, dataset, n_steps: Optional[int] = None):
        """Switch to the next frame's data and run its training schedule."""
        tr = self.trainer
        self.frame += 1
        tr.dataset = dataset
        tr._compiled.clear()        # step fns close over the dataset
        self._delta_step_fns.clear()

        if self.dyn.predict_global_movement:
            # phase 1: rigid-motion-only on frozen canonical. The motion
            # signal lives in the silhouette sliver, so keep the ray count
            # high relative to the sample budget.
            fn = self._delta_step_fn(
                max(min(tr.n_rays, 8192), 4096))
            losses = []
            for _ in range(self.dyn.predict_global_movement_training_step):
                tr.key, k = jax.random.split(tr.key)
                self.delta, self.delta_opt, loss, _ = fn(
                    tr.params, self.delta, self.delta_opt,
                    tr.occ.bitfield, k)
                self.delta_ema = jax.tree_util.tree_map(
                    lambda e, p: 0.95 * e + 0.05 * p, self.delta_ema,
                    self.delta)
                losses.append(float(loss))
            self.delta = self.delta_ema
            if self.dyn.reset_density_grid_after_global_movement:
                tr.occ = occupancy.init_state(self.cfg.train.occ_grid_size)

        # phase 2: canonical training on delta-corrected rays. The current
        # Trainer step samples rays in the frame's own space; we bake the
        # (now mostly-converged) delta into the dataset's cameras so the
        # canonical training sees canonical-space rays — equivalent to the
        # reference applying the transform per ray, with finetuning left
        # to subsequent delta phases.
        R = dn.rotation_6d_to_matrix(self.delta["rotation6d"])
        t = self.delta["translation"]
        cams = tr.dataset.cameras
        new_cams = cams._replace(
            rot_c2w=jnp.einsum("ij,njk->nik", R, cams.rot_c2w),
            origin=cams.origin @ R.T + t,
        )
        tr.dataset = dataclasses.replace(tr.dataset, cameras=new_cams)
        tr._compiled.clear()
        tr.train_steps(n_steps or self.dyn.next_frame_max_training_step)
        return self.delta

    # ------------------------------------------------------------------

    def extract_mesh(self, resolution: int = 256, **kw):
        """Mesh in the CURRENT frame's world: canonical mesh mapped back
        through the accumulated movement (transform_mesh_with_6d)."""
        from ..mesh.extract import extract_mesh

        m = extract_mesh(self.trainer.field, self.trainer.inference_params,
                         resolution=resolution,
                         meta=self.trainer.dataset.meta, **kw)
        if self.frame > 0:
            V = jnp.asarray(m["V"])
            m["V"] = np.asarray(dn.inverse_transform_points(self.delta, V))
        return m
