"""The round-4 root-cause fix: RGB+ L2 4th-channel sub-gradient.

The reference's hand-written jacobian (testbed_nerf.cu:1934-1940)
reports slope −2aᵢ/(a₄+1e−5) even where the forward √max(0, 3−Σa²) is
clamped flat at 0. Dissection of the live full-scale divergence
(runs/r4_10k/DISSECT_TRAIN_2400.log; tools/profiling/
dissect_spike_train.py) showed this drives a positive feedback loop:
with a negative 4th-channel target (GT shading < 0) and positive sample
shading, gradient descent REWARDS growing the albedo — the forward
channel never moves, the exp activation makes the gradient ∝ a, and
hash-table updates grow geometrically (×1.3/step measured) at any
update scale. The default backward is now a true sub-gradient (zero in
the clamp region); LossConfig.rgbplus_ref_jacobian restores the
reference verbatim as a control arm.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rnb_neus2_tpu.config import RenderFlags
from rnb_neus2_tpu.render.losses import (_make_guarded_sqrt,
                                         make_albedo4)

FLAGS = RenderFlags(apply_rgbplus=True, apply_l2=True)


def test_subgradient_zero_in_clamp_region():
    f = _make_guarded_sqrt(0.0, True)
    g = jax.grad(lambda x: f(x))(jnp.float32(-0.5))
    assert float(g) == 0.0
    # ... and exactly the reference's slope outside it
    g_in = jax.grad(lambda x: f(x))(jnp.float32(0.25))
    assert np.isclose(float(g_in), 0.5 / (0.5 + 1e-5))


def test_ref_jacobian_reports_slope_in_clamp_region():
    f = _make_guarded_sqrt(0.0, False)
    g = jax.grad(lambda x: f(x))(jnp.float32(-0.5))
    assert np.isclose(float(g), 0.5 / 1e-5)   # the upstream 1e5× slope


def test_forward_identical_both_arms():
    x = jnp.linspace(-2.0, 3.0, 64)
    np.testing.assert_array_equal(
        np.asarray(_make_guarded_sqrt(0.0, True)(x)),
        np.asarray(_make_guarded_sqrt(0.0, False)(x)))


def _loss(a3, ref_jacobian, shade=1.0, target4=-0.5):
    """Minimal replica of the runaway geometry: one sample, positive
    shading, negative 4th-channel target (GT shading < 0)."""
    pred4 = make_albedo4(a3, FLAGS, 0.0, ref_jacobian) * shade
    t = jnp.array([0.2, 0.2, 0.2, target4])
    return jnp.sum((pred4 - t) ** 2)


def test_beyond_manifold_gradients():
    """Past the manifold (Σa² > 3) the reference arm rewards GROWING the
    albedo through the dead channel; the fix leaves only the honest RGB
    pull-down."""
    a3 = jnp.array([1.2, 1.2, 1.2])          # Σa² = 4.32 > 3
    g_fix = jax.grad(_loss)(a3, False)
    g_ref = jax.grad(_loss)(a3, True)
    # fixed arm: channel-4 contributes nothing; rgb channels push DOWN
    # (pred 1.2 > target 0.2) so the total gradient is positive
    assert np.all(np.asarray(g_fix) > 0.0)
    # reference arm: the in-clamp pseudo-slope dominates (≈1e5×) and
    # flips the sign — the optimizer would grow the albedo
    assert np.all(np.asarray(g_ref) < 0.0)
    assert np.max(np.abs(np.asarray(g_ref))) > 1e3


def test_feedback_loop_bounded_with_fix():
    """Iterate plain gradient descent from just inside the manifold: the
    reference jacobian runs away to the activation clamp; the
    sub-gradient arm stays bounded."""
    def run(ref_jacobian, steps=200, lr=1e-3):
        raw = jnp.log(jnp.array([0.99, 0.99, 0.99]))   # Σa² ≈ 2.94
        loss_raw = lambda r: _loss(jnp.exp(jnp.clip(r, -10, 10)),
                                   ref_jacobian)
        g = jax.jit(jax.grad(loss_raw))
        for _ in range(steps):
            raw = raw - lr * g(raw)
        return float(jnp.max(jnp.exp(raw)))

    assert run(False) < 3.0                   # bounded, pulled to target
    assert run(True) > 100.0                  # runaway toward e^10


def test_within_manifold_parity():
    """Safely inside the manifold the two arms are bit-identical."""
    a3 = jnp.array([0.5, 0.4, 0.6])
    g_fix = jax.grad(_loss)(a3, False)
    g_ref = jax.grad(_loss)(a3, True)
    np.testing.assert_array_equal(np.asarray(g_fix), np.asarray(g_ref))
