"""Snapshot save/load: full training state as msgpack.

Logical contents mirror the reference's msgpack snapshot
(src/testbed.cu:3280-3402): network config, master params, EMA (inference)
params, optimizer moments, density grid stored fp16 (:3300), adaptive
rays-per-batch counter (:3351-3353), and the training step. The two-stage
pipeline resumes stage 2 from stage 1's snapshot exactly like
`--snapshot` + load_snapshot (src/main.cu:304-314, testbed.cu:3333-3390).

Serialization uses flax's msgpack (real msgpack, pytree-aware), written to
`snapshot_<step>.msgpack` paths for pipeline-layout parity.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

SNAPSHOT_VERSION = 1


def _config_to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg))


def snapshot_payload(trainer) -> Dict[str, Any]:
    """The snapshot payload with DEVICE arrays left in place (no host
    sync). save_snapshot materializes it inline; AsyncSnapshotWriter
    copies on-device first and materializes on a background thread."""
    occ = trainer.occ
    payload = {
        "version": np.int32(SNAPSHOT_VERSION),
        "step": np.int32(trainer.step),
        "n_rays": np.int32(trainer.n_rays),
        "config_json": _config_to_json(trainer.cfg),
        # to_state_dict flattens tuples/NamedTuples into msgpack-able
        # dicts; the leaves stay DEVICE arrays here — _materialize pulls
        # them to host (np.asarray) at serialization time
        "params": serialization.to_state_dict(trainer.params),
        "ema_params": serialization.to_state_dict(
            trainer.opt_state.ema_params),
        "adam_state": serialization.to_state_dict(trainer.opt_state.adam),
        "density_grid": occ.density,
        "density_ema_step": occ.ema_step,
        "rng_key": trainer.key,
        # loss EMA rides along so a resumed run's divergence guard has a
        # warm reference immediately (a cold EMA accepted a blown first
        # sync once — runs/RUN_r3: EMA poisoned at 481876, every relative
        # check blind for the rest of the run)
        "loss_ema": np.float32(trainer.loss_ema.value
                               if trainer.loss_ema._initialized
                               else np.nan),
        # warm-up progress rides along so a restore reproduces the full
        # meter state (utils.meters.Ema.updates)
        "loss_ema_updates": np.int32(trainer.loss_ema.updates),
        # guard degraded-mode state: a snapshot saved from a
        # guard-degraded (no-rgbplus) trajectory carries albedo params
        # that can sit outside the RGB+ channel's stability basin —
        # resuming it with rgbplus ON detonated within 32 steps (RUN_r3
        # attempt 2, loss 4e5). The resume must come back up degraded and
        # let the guard re-arm on its own schedule. Distinct from a user
        # --no-rgbplus config (that lives in config_json / CLI flags).
        "guard_degraded": np.bool_(
            getattr(trainer, "_guard_degraded_at", None) is not None
            and not trainer.cfg.flags.apply_rgbplus),
        "guard_rearms_used": np.int32(
            getattr(trainer, "_guard_rearms_used", 0)),
        # eikonal EMA + best-ever floors: the guard v4 ek-creep channel
        # needs a warm geometry-health reference at resume — without the
        # floor, resuming a sick snapshot seeds the floor AT the sick
        # level and the creep trip is blind for the rest of the run
        "ek_ema": np.float32(trainer.ek_ema.value
                             if trainer.ek_ema._initialized else np.nan),
        "ek_ema_updates": np.int32(trainer.ek_ema.updates),
        "guard_ek_floor": np.float32(
            getattr(trainer, "_guard_ek_floor", None)
            if getattr(trainer, "_guard_ek_floor", None) is not None
            else np.nan),
        "guard_ema_floor": np.float32(
            getattr(trainer, "_guard_ema_floor", None)
            if getattr(trainer, "_guard_ema_floor", None) is not None
            else np.nan),
    }
    return payload


def _materialize(payload: Dict[str, Any]) -> Dict[str, Any]:
    """Pull every device leaf to host numpy (blocks until computed) and
    apply the reference's fp16 density-grid storage (testbed.cu:3300)."""
    out = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
        payload)
    out["density_grid"] = np.asarray(out["density_grid"]).astype(np.float16)
    return out


def save_snapshot(path: str, trainer) -> None:
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            _materialize(snapshot_payload(trainer))))


class AsyncSnapshotWriter:
    """Rolling-snapshot writer off the training critical path.

    The synchronous rolling save cost ~200 ms device-pull + ~1 s
    serialize/write of the ~215 MB state every 200 steps over the remote
    transport (DESIGN.md production-vs-bench reconciliation). submit()
    instead (a) copies the state ON-DEVICE (async dispatch, no host
    sync — jnp.copy, the same trick as the divergence guard's
    checkpoints; a plain reference could be invalidated by the next
    step's buffer donation) and (b) hands the copies to a daemon thread
    that pulls, serializes, and atomically rotates
    latest.tmp → latest → latest.prev. At most one write is in flight:
    a submit while busy is skipped (the next cadence boundary retries —
    bounded memory beats a fresher generation on a slow disk).
    """

    def __init__(self):
        import threading
        self._threading = threading
        self._thread = None

    def busy(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    def join(self, timeout: float | None = None) -> None:
        if self._thread is not None:
            self._thread.join(timeout)

    def submit(self, latest_path: str, trainer, logger=None) -> bool:
        if self.busy():
            if logger:
                logger.info("rolling snapshot writer busy — skipping "
                            "this generation")
            return False
        payload = snapshot_payload(trainer)
        payload = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
            payload)
        self._thread = self._threading.Thread(
            target=self._write, args=(latest_path, payload, logger),
            daemon=True)
        self._thread.start()
        return True

    @staticmethod
    def _write(latest: str, payload: Dict[str, Any], logger=None) -> None:
        import os
        try:
            blob = serialization.msgpack_serialize(_materialize(payload))
            with open(latest + ".tmp", "wb") as f:
                f.write(blob)
            # rotate only after the new generation is fully on disk (the
            # old inline order moved latest→prev BEFORE writing, so a
            # failed write cost the newest good generation)
            if os.path.exists(latest):
                os.replace(latest, latest + ".prev")
            os.replace(latest + ".tmp", latest)
        except Exception as e:          # never kill the training loop
            if logger:
                logger.error(f"async rolling snapshot failed: {e}")


def load_snapshot(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_trainer(trainer, snap: Dict[str, Any]) -> None:
    """In-place restore onto a freshly constructed Trainer with the same
    config (the caller builds the Trainer from the snapshot's config)."""
    from ..grid import occupancy

    def like(template, data):
        return jax.tree_util.tree_map(
            lambda t, d: jnp.asarray(d, getattr(t, "dtype", None)),
            template, data, is_leaf=lambda x: isinstance(x, jnp.ndarray))

    trainer.params = serialization.from_state_dict(trainer.params,
                                                   snap["params"])
    adam_sd = snap["adam_state"]
    tmpl_adam = serialization.to_state_dict(trainer.opt_state.adam)
    if "1" in adam_sd and "1" in tmpl_adam:
        has, wants = "steps" in adam_sd["1"], "steps" in tmpl_adam["1"]
        if wants and not has:
            # pre-sparse-Adam snapshot (rounds 1-2 dense optax state):
            # synthesize per-param debias counters at the dense global
            # count — the closest dense-equivalent restore point
            cnt = int(np.asarray(adam_sd["1"]["count"]))
            adam_sd = dict(adam_sd)
            adam_sd["1"] = dict(adam_sd["1"])
            adam_sd["1"]["steps"] = jax.tree_util.tree_map(
                lambda m: np.full(np.asarray(m).shape, cnt, np.int32),
                adam_sd["1"]["mu"])
        elif has and not wants:
            # sparse-Adam snapshot loaded into a dense optimizer
            adam_sd = dict(adam_sd)
            adam_sd["1"] = {k: v for k, v in adam_sd["1"].items()
                            if k != "steps"}
    adam = serialization.from_state_dict(trainer.opt_state.adam, adam_sd)
    ema = serialization.from_state_dict(trainer.opt_state.ema_params,
                                        snap["ema_params"])
    from .optimizer import OptState
    trainer.opt_state = OptState(adam=adam, ema_params=ema)
    trainer.step = int(snap["step"])
    trainer.n_rays = int(snap["n_rays"])
    density = jnp.asarray(np.asarray(snap["density_grid"]), jnp.float32)
    mean = jnp.mean(jnp.maximum(density, 0.0))
    from ..config import NERF_MIN_OPTICAL_THICKNESS
    bit = density > jnp.minimum(NERF_MIN_OPTICAL_THICKNESS, mean)
    trainer.occ = occupancy.OccupancyState(
        density=density, bitfield=bit, mean_density=mean,
        ema_step=jnp.asarray(np.asarray(snap["density_ema_step"]),
                             jnp.int32))
    trainer.key = jnp.asarray(np.asarray(snap["rng_key"]), jnp.uint32)
    # warm the divergence guard's loss-EMA reference (absent in pre-r3
    # snapshots; NaN sentinel = the saved run had no initialized EMA).
    # A persisted finite EMA from a pre-`loss_ema_updates` snapshot had
    # trained long enough to reach a rolling snapshot — default its
    # update count to a half-life's worth.
    ema_val = float(np.asarray(snap.get("loss_ema", np.nan)))
    if math.isfinite(ema_val):
        updates = int(np.asarray(snap.get(
            "loss_ema_updates", int(trainer.loss_ema.half_life))))
        trainer.loss_ema.set(ema_val, updates=updates)
    # guard v4 geometry-health state (absent in older snapshots)
    ek_val = float(np.asarray(snap.get("ek_ema", np.nan)))
    if math.isfinite(ek_val):
        trainer.ek_ema.set(ek_val, updates=int(np.asarray(snap.get(
            "ek_ema_updates", int(trainer.ek_ema.half_life)))))
    ek_floor = float(np.asarray(snap.get("guard_ek_floor", np.nan)))
    if math.isfinite(ek_floor):
        trainer._guard_ek_floor = ek_floor
    ema_floor = float(np.asarray(snap.get("guard_ema_floor", np.nan)))
    if math.isfinite(ema_floor):
        trainer._guard_ema_floor = ema_floor
    # guard-degraded trajectory: come back up with the RGB+ channel off
    # (the saved albedo params can sit outside its stability basin —
    # RUN_r3 attempt 2 detonated at resume) and the re-arm budget intact
    if bool(np.asarray(snap.get("guard_degraded", False))) \
            and trainer.cfg.flags.apply_rgbplus:
        trainer.cfg = dataclasses.replace(
            trainer.cfg, flags=dataclasses.replace(
                trainer.cfg.flags, apply_rgbplus=False))
        trainer._compiled.clear()
        trainer._guard_degraded_at = trainer.step
        trainer._guard_rearms_used = int(np.asarray(
            snap.get("guard_rearms_used", 0)))
    # the restored state IS a healthy checkpoint — give the guard a
    # rollback target before the first post-resume sync (a resume into
    # the unstable window otherwise has nothing to restore)
    trainer.seed_guard()
