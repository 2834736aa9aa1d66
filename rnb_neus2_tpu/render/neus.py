"""NeuS SDF→alpha conversion and compositing, fixed-shape and batched.

Math follows the reference's training/render kernels
(`src/testbed_nerf.cu:1652-1716` and `:985-1030`): section-based alpha from
the logistic CDF of the SDF at the section endpoints, with the cos-annealed
direction·gradient estimate, epsilon-regularized ratio, and early ray
termination at transmittance < 1e-4. The reference walks samples serially
with pointer arithmetic and breaks; here everything is a (R, K) masked
cumulative product — XLA-friendly, trivially sharded over rays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import TRANSMITTANCE_EPSILON


class CompositeOut(NamedTuple):
    alpha: jnp.ndarray      # (R, K)
    weight: jnp.ndarray     # (R, K)  = alpha · T, zeroed for dropped samples
    trans: jnp.ndarray      # (R, K)  transmittance BEFORE each sample
    keep: jnp.ndarray       # (R, K)  sample kept (valid & T ≥ ε)


def sdf_to_alpha(sdf: jnp.ndarray, true_cos: jnp.ndarray, dt: jnp.ndarray,
                 inv_s: jnp.ndarray, cos_anneal_ratio: jnp.ndarray
                 ) -> jnp.ndarray:
    """Per-sample NeuS alpha (testbed_nerf.cu:1652-1677).

    iter_cos = −(relu(−tc·0.5+0.5)·(1−a) + relu(−tc)·a); section endpoints
    sdf ± iter_cos·dt/2; alpha = clip((cdf_prev − cdf_next + 1e−5) /
    (cdf_prev + 1e−5), 0, 1).
    """
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + jax.nn.relu(-true_cos) * cos_anneal_ratio)
    est_next = sdf + iter_cos * dt * 0.5
    est_prev = sdf - iter_cos * dt * 0.5
    cdf_next = jax.nn.sigmoid(est_next * inv_s)
    cdf_prev = jax.nn.sigmoid(est_prev * inv_s)
    p = cdf_prev - cdf_next
    return jnp.clip((p + 1e-5) / (cdf_prev + 1e-5), 0.0, 1.0)


def composite(alpha: jnp.ndarray, valid: jnp.ndarray) -> CompositeOut:
    """Front-to-back compositing with the reference's termination rule:
    a sample participates iff it is valid and the transmittance entering it
    is ≥ 1e−4 (the serial loop breaks at T < EPSILON,
    testbed_nerf.cu:1491-1494)."""
    alpha = jnp.where(valid, alpha, 0.0)
    one_minus = 1.0 - alpha
    # exclusive cumulative product along samples (T entering sample j)
    inc = jnp.cumprod(one_minus, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(inc[..., :1]), inc[..., :-1]],
                            axis=-1)
    keep = valid & (trans >= TRANSMITTANCE_EPSILON)
    weight = jnp.where(keep, alpha * trans, 0.0)
    return CompositeOut(alpha=alpha, weight=weight, trans=trans, keep=keep)
