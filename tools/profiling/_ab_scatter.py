"""A/B the encode-backward scatter formulation: time sampler+loss+grad
with VARYING keys (defeats runtime memoization of identical executions)."""
import sys
import time

import jax
import jax.numpy as jnp

from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
from rnb_neus2_tpu.models.neus_field import NeusField, init_params
from rnb_neus2_tpu.ops import hash_encoding
from rnb_neus2_tpu.render.losses import training_loss
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.sampler import sample_ray_batch
from rnb_neus2_tpu.grid import occupancy

print("scatter mode:", hash_encoding._SCATTER_MODE)
cfg = TestbedConfig(train=TrainConfig(seed=0))
field = NeusField(cfg.grid, cfg.network)
params = init_params(jax.random.PRNGKey(0), cfg.grid, cfg.network)
ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                    cam_radius=1.6, focal=900.0)
occ = occupancy.init_state(cfg.train.occ_grid_size)
n_rays, n_slots = 4096, cfg.train.target_batch_size


@jax.jit
def loss_grad(params, key):
    batch, samples, pos, _ = sample_ray_batch(
        ds, occ.bitfield, key, n_rays, n_slots, cfg.march)

    def loss_fn(p):
        out = field.apply_chunked(p, pos, None, cfg.train.field_chunk, 14)
        return training_loss(out, samples, batch, cfg.flags, cfg.loss,
                             1.0)[0]

    return jax.value_and_grad(loss_fn)(params)


keys = [jax.random.PRNGKey(i) for i in range(40)]
out = loss_grad(params, keys[0])
jax.block_until_ready(out)
t0 = time.perf_counter()
outs = [loss_grad(params, k) for k in keys[1:9]]
jax.block_until_ready(outs)
print("sampler+loss+grad: %.1f ms" % ((time.perf_counter() - t0) / 8 * 1e3))
