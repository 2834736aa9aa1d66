"""Decompose the 1100ms train step on real TPU: where does the time go?"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer, valid_level_for_step
from rnb_neus2_tpu.train.sampler import sample_ray_batch
from rnb_neus2_tpu.render.losses import training_loss
from rnb_neus2_tpu.train import optimizer as opt


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                    cam_radius=1.6, focal=900.0)
cfg = TestbedConfig(train=TrainConfig(seed=0))
tr = Trainer(ds, cfg)
for _ in range(20):
    tr.train_step()
tr.step = 600
for _ in range(4):
    tr.train_step()

print("full step (steady):", timeit(lambda: tr.train_steps(8, sync_every=8), n=4) / 8, "ms")

# pieces
n_rays = tr._bucket()
lb = tr._level_bucket()
n_slots = cfg.train.target_batch_size
key = jax.random.PRNGKey(7)
params = tr.params
field = tr.field
print("n_rays bucket:", n_rays, "level bucket:", lb)

samp = jax.jit(lambda key: sample_ray_batch(
    ds, tr.occ.bitfield, key, n_rays, n_slots, cfg.march,
    emap_state=tr.emap))
print("sampler:", timeit(samp, key), "ms")

batch, samples, pos, _ = samp(key)
vl = valid_level_for_step(cfg.grid, jnp.int32(600))

fwd = jax.jit(lambda p, x: field.apply_chunked(p, x, vl, cfg.train.field_chunk, lb))
print("field fwd:", timeit(fwd, params, pos), "ms")

def loss_fn(p, pos):
    out = field.apply_chunked(p, pos, vl, cfg.train.field_chunk, lb)
    return training_loss(out, samples, batch, cfg.flags, cfg.loss, 1.0)

lossj = jax.jit(lambda p, pos: loss_fn(p, pos)[0])
print("loss fwd:", timeit(lossj, params, pos), "ms")

gradj = jax.jit(lambda p, pos: jax.value_and_grad(
    lambda q: loss_fn(q, pos)[0])(p))
print("loss+grad:", timeit(gradj, params, pos), "ms")

grads = gradj(params, pos)[1]
updj = jax.jit(lambda p, g, s: opt.apply_updates(
    tr.tx, cfg.optimizer, p, g, s, jnp.float32(1.0)))
print("optimizer:", timeit(updj, params, grads, tr.opt_state), "ms")

occf = tr._occ_update_fn(lb)
print("occ update (every 16):", timeit(occf, params, tr.occ, key, jnp.int32(600)), "ms")
