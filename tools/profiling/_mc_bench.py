"""End-to-end extract_mesh timing (new table-MC) at 256/512 on real TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer
from rnb_neus2_tpu.mesh import extract

ds = sphere_dataset(n_views=8, width=128, height=128, radius=0.35,
                    cam_radius=1.6, focal=220.0)
tr = Trainer(ds, TestbedConfig(train=TrainConfig(
    seed=0, initial_rays_per_batch=1024, max_rays_per_batch=1024)))
for _ in range(60):
    tr.train_step()
print("trained 60 steps", flush=True)

for res in (256, 512):
    t0 = time.perf_counter()
    m = extract.extract_mesh(tr.field, tr.inference_params, resolution=res,
                             meta=tr.dataset.meta)
    dt = time.perf_counter() - t0
    print(f"res {res}: {dt:.1f}s  V={len(m['V'])} F={len(m['F'])}",
          flush=True)
