"""Phase-instrumented extract_mesh timing, warm repeat."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer
from rnb_neus2_tpu.mesh import extract, marching

ds = sphere_dataset(n_views=8, width=128, height=128, radius=0.35,
                    cam_radius=1.6, focal=220.0)
tr = Trainer(ds, TestbedConfig(train=TrainConfig(
    seed=0, initial_rays_per_batch=1024, max_rays_per_batch=1024)))
for _ in range(60):
    tr.train_step()
print("trained", flush=True)

# monkeypatch timers
orig_sdfvol = extract._sdf_volume
def timed_sdfvol(field, params, pts, chunk=1 << 17, valid_level=None):
    t0 = time.perf_counter()
    out = orig_sdfvol(field, params, pts, chunk, valid_level)
    print(f"  _sdf_volume n={len(pts):>9} chunk={chunk} "
          f"{time.perf_counter()-t0:6.1f}s", flush=True)
    return out
extract._sdf_volume = timed_sdfvol

orig_mc = marching.marching_cubes_grid
def timed_mc(vol, origin, spacing, thresh=0.0):
    t0 = time.perf_counter()
    out = orig_mc(vol, origin, spacing, thresh)
    print(f"  marching_cubes_grid {vol.shape} {time.perf_counter()-t0:6.1f}s",
          flush=True)
    return out
marching.marching_cubes_grid = timed_mc

for rep in range(2):
    t0 = time.perf_counter()
    m = extract.extract_mesh(tr.field, tr.inference_params, resolution=256,
                             meta=tr.dataset.meta)
    print(f"rep{rep} res 256 total: {time.perf_counter()-t0:.1f}s "
          f"V={len(m['V'])}", flush=True)
