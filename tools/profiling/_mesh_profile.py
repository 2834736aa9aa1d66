"""Phase-level timing of extract_mesh at res 256 on real TPU."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

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
print("trained 60 steps", flush=True)

field, params = tr.field, tr.inference_params
res, block = 256, 16
lo, hi, span = 0.0, 1.0, 1.0
spacing = span / res
cf = 4
cres = res // cf

t0 = time.perf_counter()
axc = lo + (np.arange(cres) + 0.5) * (span / cres)
cg = np.stack(np.meshgrid(axc, axc, axc, indexing="ij"), -1)
csdf = extract._sdf_volume(field, params,
                           cg.reshape(-1, 3).astype(np.float32))
print("coarse pass (%d pts): %.1fs" % (cg.size // 3,
                                       time.perf_counter() - t0), flush=True)

t0 = time.perf_counter()
csdf3 = csdf.reshape(cres, cres, cres)
slack = 2.0 * (span / cres) * np.sqrt(3)
nb = res // block
cpb = cres // nb
cblk = csdf3.reshape(nb, cpb, nb, cpb, nb, cpb)
bmin = np.abs(cblk).min(axis=(1, 3, 5))
active = np.argwhere(bmin < slack)
print("active blocks: %d / %d  (%.2fs)" % (len(active), nb ** 3,
                                           time.perf_counter() - t0),
      flush=True)

ax_local = np.arange(block + 1)
local = np.stack(np.meshgrid(ax_local, ax_local, ax_local,
                             indexing="ij"), -1).reshape(-1, 3)
bpts = block + 1
t0 = time.perf_counter()
i0s = active * block
idx = (i0s[:, None, :] + local[None, :, :]).reshape(-1, 3)
pts = lo + idx.astype(np.float32) * spacing
np.clip(pts, lo, hi, out=pts)
print("fine pts: %d" % len(pts), flush=True)
vols = extract._sdf_volume(field, params, pts).reshape(
    len(active), bpts, bpts, bpts)
print("fine field eval: %.1fs" % (time.perf_counter() - t0), flush=True)

t0 = time.perf_counter()
nv = 0
for vol, i0 in zip(vols, i0s):
    origin = lo + i0.astype(np.float64) * spacing
    v, f = marching.marching_tets(vol, origin, spacing, 0.0)
    nv += len(v)
print("marching (host): %.1fs, %d verts" % (time.perf_counter() - t0, nv),
      flush=True)
