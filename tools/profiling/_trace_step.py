"""Capture a jax.profiler trace of steady-state training steps."""
import sys; sys.path.insert(0, "/root/repo")
import jax

from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer

ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                    cam_radius=1.6, focal=900.0)
cfg = TestbedConfig(train=TrainConfig(seed=0))
tr = Trainer(ds, cfg)
for _ in range(20):
    tr.train_step()
tr.step = 600
for _ in range(4):
    tr.train_step()

with jax.profiler.trace("/tmp/jaxtrace"):
    out = tr.train_steps(6, sync_every=6)
print("done", out["loss_total"])
