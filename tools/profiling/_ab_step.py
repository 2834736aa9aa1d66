"""A/B full-step time: width1 vs complex scatter, pinned ray bucket."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
from rnb_neus2_tpu.ops import hash_encoding as he
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer

ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                    cam_radius=1.6, focal=900.0)


def measure(mode):
    he._SCATTER_MODE = mode
    cfg = TestbedConfig(train=TrainConfig(
        seed=0, initial_rays_per_batch=4096, max_rays_per_batch=4096))
    tr = Trainer(ds, cfg)
    tr.step = 600                    # steady state immediately
    for _ in range(20):              # compiles step_fn + subsampled occ
        tr.train_step()
    t0 = time.perf_counter()
    out = tr.train_steps(24, sync_every=8)
    dt = (time.perf_counter() - t0) / 24 * 1e3
    print("mode %-8s FULL STEP: %7.1f ms  (loss %.4f)"
          % (mode, dt, out["loss_total"]), flush=True)


measure("auto")

