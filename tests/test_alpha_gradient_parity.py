"""Per-sample alpha-gradient parity vs the reference's hand-derived
backward (round-5 forensics, testbed_nerf.cu:1965-2050).

The reference hand-derives dα/d{sdf, inv_s, true_cos} through the
(e^{-est_next·s}, e^{s·iter_cos·dt}) parameterization; our training
loss is `jax.grad` of the forward restatement (render/neus.sdf_to_alpha).
The round-4 RGB+ saga proved hand-derived-vs-autodiff mismatches are a
real failure class here; this pins the alpha chain to float precision
across the (sdf × cos × sharpness) grid so it can never silently drift.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnb_neus2_tpu.render.neus import sdf_to_alpha


def ref_grads(sdf, tc, dt, inv_s):
    """testbed_nerf.cu:1965-2050 verbatim (cos_anneal_ratio = 1)."""
    iter_cos = -max(-tc, 0.0)
    est_next = sdf + iter_cos * dt * 0.5
    est_prev = sdf - iter_cos * dt * 0.5
    next_cdf = 1 / (1 + np.exp(-est_next * inv_s))
    prev_cdf = 1 / (1 + np.exp(-est_prev * inv_s))
    p = prev_cdf - next_cdf
    c = prev_cdf
    p_div_c = (p + 1e-5) / (c + 1e-5)
    alpha = np.clip(p_div_c, 0.0, 1.0)
    if p_div_c <= 0.0 or p_div_c >= 1.0:
        return alpha, 0.0, 0.0, 0.0
    plus_e = np.exp(inv_s * iter_cos * dt)
    e_m = np.exp(-est_next * inv_s)
    d_e_dsdf = -inv_s * e_m
    d_e_dinvs = -est_next * e_m
    a = 1 + e_m
    b = 1 + plus_e * e_m
    c2 = 1e-5 + 1 / (1 + plus_e * e_m)
    delta = a * b * b * c2 * c2
    dalpha_de = -(plus_e / delta - 1 / (a * a * c2))
    d_alpha_d_plus_e = -e_m / delta
    d_plus_e_dinvs = plus_e * iter_cos * dt
    d_plus_e_iter_cos = plus_e * inv_s * dt
    d_e_diter_cos = -inv_s * e_m * dt * 0.5
    dinvs = dalpha_de * d_e_dinvs + d_alpha_d_plus_e * d_plus_e_dinvs
    d_iter = 0.0 if tc >= 0 else 1.0
    dtc = (dalpha_de * d_e_diter_cos
           + d_plus_e_iter_cos * d_alpha_d_plus_e) * d_iter
    dsdf = dalpha_de * d_e_dsdf
    return alpha, dsdf, dinvs, dtc


@pytest.mark.parametrize("sdf", [0.3, 0.1, 0.02, 0.0, -0.02, -0.1])
@pytest.mark.parametrize("tc", [-0.9, -0.3, 0.3])
@pytest.mark.parametrize("inv_s", [5.0, 20.0, 100.0])
def test_alpha_grads_match_reference(sdf, tc, inv_s):
    dt = 0.0017
    _, rdsdf, rdinv, rdtc = ref_grads(sdf, tc, dt, inv_s)
    f = lambda s, t, i: sdf_to_alpha(s, t, jnp.asarray([dt]), i, 1.0).sum()
    g = jax.grad(f, argnums=(0, 1, 2))
    arr = lambda v: jnp.asarray([v], jnp.float32)
    dsj, dtcj, dij = [float(x[0]) for x in g(arr(sdf), arr(tc), arr(inv_s))]
    # the reference zeroes its chain in fp32-underflow regions (its
    # exp(-est*s) flushes); allow absolute slack there
    tol = lambda a, b: abs(a - b) <= 2e-3 * max(1.0, abs(a), abs(b))
    assert tol(rdsdf, dsj), (rdsdf, dsj)
    assert tol(rdinv, dij), (rdinv, dij)
    assert tol(rdtc, dtcj), (rdtc, dtcj)
