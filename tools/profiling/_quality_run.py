"""Full-size quality validation: train the DiLiGenT-MV-sized synthetic
sphere scene (20 views, 512x612, full 14-level config) on real TPU,
extract the mesh, report radius accuracy + throughput."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax

from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer

RADIUS = 0.35
ds = sphere_dataset(n_views=20, width=512, height=612, radius=RADIUS,
                    cam_radius=1.6, focal=900.0)
cfg = TestbedConfig(train=TrainConfig(seed=0))
tr = Trainer(ds, cfg)
t0 = time.perf_counter()
for k in range(20):
    out = tr.train_steps(100, sync_every=25)
    el = time.perf_counter() - t0
    print(f"step {tr.step:5d}  loss_color={out['loss_color']:.5f} "
          f"ek={out['loss_ek']:.4f} mask={out['loss_mask']:.4f} "
          f"ws={out['weight_sum_mean']:.3f} inv_s={out['inv_s']:.0f} "
          f"rays={out['rays_per_batch']} elapsed={el:.0f}s "
          f"({el / tr.step * 1e3:.0f} ms/step avg)", flush=True)

# mesh extraction at 256 (full-scale MC smoke) on EMA params
from rnb_neus2_tpu.mesh.extract import extract_mesh
t1 = time.perf_counter()
mesh = extract_mesh(tr.field, tr.inference_params, resolution=256,
                    meta=ds.meta)
print("mesh: %d verts %d faces in %.1fs" %
      (len(mesh["V"]), len(mesh["F"]), time.perf_counter() - t1), flush=True)
# mesh["V"] is in WORLD coordinates (n2w applied): the synthetic scene's
# sphere is centered at the world origin
r = np.linalg.norm(np.asarray(mesh["V"]), axis=1)
print("radius: mean %.4f (target %.4f)  std %.4f  p5 %.4f p95 %.4f"
      % (r.mean(), RADIUS, r.std(), np.percentile(r, 5),
         np.percentile(r, 95)))
