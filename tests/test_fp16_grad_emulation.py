"""fp16 loss-gradient-chain emulation (LossConfig.fp16_grad_emulation).

The reference stores dL/doutput as fp16 scaled by LOSS_SCALE=128
(testbed.h:237, testbed_nerf.cu:1960-2083) and accumulates parameter
gradients in fp16 at that scale (adam.h:88 divides it back out). The
emulation must reproduce exactly that quantization: 11-bit rounding
in-range, saturation at ±65504/128 in unscaled units, flush-to-zero
below fp16's subnormal range.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.render.losses import (LOSS_SCALE, fp16_grad_barrier,
                                         quantize_grads_fp16, training_loss)


def _quant(v):
    return float(np.float16(np.clip(v * LOSS_SCALE, -65504, 65504))
                 ) / LOSS_SCALE


def test_barrier_cotangent_quantization():
    # the barrier sits on x, so the cotangent reaching it IS c — the
    # emulated gradient must be the fp16-quantized c
    for c in (0.123456789, -3.14159, 1e-3, 7.7e5, -1e9, 1e-12, 0.0):
        g = jax.grad(lambda x: jnp.sum(fp16_grad_barrier(x) *
                                       jnp.float32(c)))(jnp.float32(1.0))
        assert float(g) == _quant(c), (c, float(g), _quant(c))


def test_barrier_saturates_not_inf():
    g = jax.grad(lambda x: jnp.sum(fp16_grad_barrier(x) * 1e30))(
        jnp.float32(1.0))
    assert np.isfinite(float(g))
    assert float(g) == 65504.0 / LOSS_SCALE


def test_barrier_forward_is_identity():
    x = jnp.linspace(-5, 5, 17)
    np.testing.assert_array_equal(np.asarray(fp16_grad_barrier(x)),
                                  np.asarray(x))


def test_quantize_grads_tree():
    tree = {"a": jnp.asarray([1e-12, 0.25, -1e9]),
            "b": {"c": jnp.float32(0.1)}}
    out = quantize_grads_fp16(tree)
    got = np.asarray(out["a"])
    assert got[0] == 0.0                      # flushed
    assert got[1] == _quant(0.25)
    assert got[2] == -65504.0 / LOSS_SCALE    # saturated
    assert float(out["b"]["c"]) == _quant(0.1)


def test_training_loss_grads_match_in_range():
    """With healthy-scale gradients the emulation is a ≤2^-11 relative
    rounding of the fp32 gradients — same direction, same magnitudes."""
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset
    from rnb_neus2_tpu.train.sampler import sample_ray_batch
    from rnb_neus2_tpu.train.trainer import Trainer

    ds = sphere_dataset(n_views=4, width=24, height=24, radius=0.2)
    cfg = TestbedConfig(
        grid=HashGridConfig(n_levels=4, top_resolution=64),
        train=TrainConfig(target_batch_size=1 << 11,
                          initial_rays_per_batch=128,
                          occ_grid_size=32, seed=0),
        march=MarchConfig(n_ladder=256, cone_angle=1.0 / 256.0))
    tr = Trainer(ds, cfg)
    batch, samples, pos, _ = sample_ray_batch(
        ds, tr.occ.bitfield, jax.random.PRNGKey(3), 128,
        cfg.train.target_batch_size, cfg.march)

    def grads(emulate):
        loss_cfg = dataclasses.replace(cfg.loss,
                                       fp16_grad_emulation=emulate)

        def loss_fn(p):
            out = tr.field.apply(p, pos)
            total, _ = training_loss(out, samples, batch, cfg.flags,
                                     loss_cfg, 1.0)
            return total

        return jax.grad(loss_fn)(tr.params)

    g32, g16 = grads(False), grads(True)
    for name in ("hash_table", "variance"):
        a = np.asarray(jax.tree_util.tree_leaves(g32[name])[0]).ravel()
        b = np.asarray(jax.tree_util.tree_leaves(g16[name])[0]).ravel()
        assert np.all(np.isfinite(b))
        denom = np.maximum(np.abs(a).max(), 1e-12)
        # fp16 has 11 mantissa bits; allow headroom for the two stacked
        # quantizations (output cotangent + parameter gradient)
        assert np.abs(a - b).max() / denom < 4e-3, name
