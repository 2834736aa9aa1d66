"""Bisect fwd/bwd cost of field components at 2^18 samples on real TPU."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time
import jax
import jax.numpy as jnp
import numpy as np

from rnb_neus2_tpu.config import TestbedConfig, TrainConfig
from rnb_neus2_tpu.models.neus_field import NeusField, init_params
from rnb_neus2_tpu.ops import hash_encoding

cfg = TestbedConfig()
field = NeusField(cfg.grid, cfg.network)
params = init_params(jax.random.PRNGKey(0), cfg.grid, cfg.network)
N = 1 << 18
x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))


def timeit(fn, *args, n=10):
    fnj = jax.jit(fn)
    out = fnj(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fnj(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def _sum(o):
    if isinstance(o, dict):
        return sum(jnp.sum(v) for v in o.values())
    if isinstance(o, tuple):
        return sum(jnp.sum(v) for v in o)
    return jnp.sum(o)


def grad_of(fn):
    def g(p, xx):
        return jax.grad(lambda q: _sum(fn(q, xx)))(p)
    return g


enc_plain = lambda p, xx: hash_encoding.encode(p["hash_table"], xx,
                                               field.static)
print("encode fwd:            %7.1f ms" % timeit(enc_plain, params, x))
print("encode fwd+bwd:        %7.1f ms" % timeit(grad_of(enc_plain), params, x))

encj = lambda p, xx: field._encode_jac(p["hash_table"], xx, None, 14)
print("encode+jac fwd:        %7.1f ms" % timeit(encj, params, x))
print("encode+jac fwd+bwd:    %7.1f ms" % timeit(grad_of(encj), params, x))

# full training step through the Trainer (steady state)
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train.trainer import Trainer

ds = sphere_dataset(n_views=20, width=512, height=612, radius=0.35,
                    cam_radius=1.6, focal=900.0)
tr = Trainer(ds, TestbedConfig(train=TrainConfig(seed=0)))
for _ in range(20):
    tr.train_step()
tr.step = 600
# cross one occupancy refresh (every 16 steps) so the steady-state
# subsampled occ_fn compiles BEFORE the timed window
for _ in range(20):
    tr.train_step()
t0 = time.perf_counter()
out = tr.train_steps(32, sync_every=8)
dt = (time.perf_counter() - t0) / 32 * 1e3
print("FULL STEP (steady):    %7.1f ms   rays=%d" % (dt, out["rays_per_batch"]))

occf = tr._occ_update_fn(tr._level_bucket(), subsampled=True)
print("occ update:            %7.1f ms" %
      timeit(occf, tr.params, tr.occ, jax.random.PRNGKey(7), jnp.int32(600), n=3))
