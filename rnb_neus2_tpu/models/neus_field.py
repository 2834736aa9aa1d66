"""NeuS field: hash encoding → SDF MLP → analytic ∇sdf → RGB (albedo) MLP.

Reimplements the behavior of the reference's `NerfNetwork`
(`include/neural-graphics-primitives/nerf_network.h`):

- SDF-MLP input = [xyz−0.5 (3) | hash features(28)] zero-padded to 48
  (nerf_network.h:46-61 with GEOMETRY_INIT=1; the centering is
  common_operation.cuh:187-199 `fill_positions_view_with_fixed_offset`).
  With the geometric init this makes the initial field a sphere SDF
  ≈ 1.07·(‖x−0.5‖ − 0.093): negative inside a small central sphere;
- sdf = sdf_mlp_out[0] + sdf_bias(−0.1) (nerf_network.h:225-232);
- ∇sdf computed **in the forward pass** by differentiating through the
  encoding + SDF MLP (nerf_network.h:163-190) — here one inner `jax.grad`;
- RGB-MLP input = [sdf feature(16) | dir-encoding slot(16, always zeros —
  the reference never runs the dir encoding, nerf_network.h:193-203
  `if (false)`) | xyz(3) | ∇sdf(3)] zero-padded to 48;
- trainable scalar variance, init 0.3 (testbed.cu:692), inv_s = exp(10·v);
- geometric (SAL) initialization of the SDF MLP: hidden weights
  N(0, √2/√out) with zeros on the hash-feature columns of the first layer,
  output weights ≡ √π/√in (reproduces `utils/mlp_weights.txt`
  distributionally; nerf_network.h:585-643 loads the equivalent from disk).

The reference wires dL/d∇sdf into hand-written `backward_backward_input`
kernels (nerf_network.h:342-450). Here ∇sdf is itself a differentiable jnp
expression, so `jax.grad` of the training loss produces the identical
second-order path automatically.

Parameter tree (all fp32 master copies):
  {"hash_table": (T, F), "sdf_mlp": [W...], "rgb_mlp": [W...],
   "variance": (1,)}
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import HashGridConfig, NetworkConfig
from ..ops import hash_encoding
from ..ops.mlp import apply_mlp, xavier_uniform


def _geometric_init_sdf_mlp(key: jax.Array, net: NetworkConfig,
                            n_geo_dims: int = 3):
    """SAL geometric init (matches utils/mlp_weights.txt structure)."""
    dims = ([net.sdf_input_dim] + [net.sdf_width] * net.sdf_hidden_layers
            + [net.n_output_dims])
    weights = []
    n_layers = len(dims) - 1
    keys = jax.random.split(key, n_layers)
    for i in range(n_layers):
        n_in, n_out = dims[i], dims[i + 1]
        if i == n_layers - 1:
            # output layer: constant sqrt(pi/fan_in) + tiny symmetry noise
            w = (jnp.full((n_out, n_in), (jnp.pi / n_in) ** 0.5)
                 + 1e-5 * jax.random.normal(keys[i], (n_out, n_in)))
        else:
            w = ((2.0 ** 0.5) / (n_out ** 0.5)
                 * jax.random.normal(keys[i], (n_out, n_in)))
            if i == 0:
                # zero the hash-feature (and pad) columns: geometry only
                col = jnp.arange(n_in) < n_geo_dims
                w = w * col[None, :]
        weights.append(w.astype(jnp.float32))
    return weights


def init_params(key: jax.Array, grid: HashGridConfig,
                net: NetworkConfig) -> Dict[str, Any]:
    k_table, k_sdf, k_rgb = jax.random.split(key, 3)
    rgb_dims = ([net.rgb_input_dim] + [net.rgb_width] * net.rgb_hidden_layers
                + [net.n_output_dims])
    rgb_keys = jax.random.split(k_rgb, len(rgb_dims) - 1)
    return {
        "hash_table": hash_encoding.init_table(k_table, grid),
        "sdf_mlp": _geometric_init_sdf_mlp(k_sdf, net),
        "rgb_mlp": [xavier_uniform(k, rgb_dims[i + 1], rgb_dims[i])
                    for i, k in enumerate(rgb_keys)],
        "variance": jnp.full((1,), net.variance_init, jnp.float32),
    }


class NeusField:
    """Stateless apply functions closed over static config."""

    def __init__(self, grid: HashGridConfig, net: NetworkConfig):
        self.grid = grid
        self.net = net
        self.static = hash_encoding.HashGridStatic(grid)

    # -- SDF ---------------------------------------------------------------

    def sdf_features(self, params, x: jnp.ndarray,
                     valid_level=None) -> jnp.ndarray:
        """(N,3)→(N,16) raw SDF-MLP output (row 0 + bias = sdf)."""
        enc = hash_encoding.encode(params["hash_table"], x, self.static,
                                   valid_level)
        n = x.shape[0]
        pad = self.net.sdf_input_dim - 3 - enc.shape[1]
        inp = jnp.concatenate(
            [x - 0.5, enc]
            + ([jnp.zeros((n, pad), enc.dtype)] if pad else []), axis=1)
        return apply_mlp(params["sdf_mlp"], inp)

    def sdf(self, params, x: jnp.ndarray, valid_level=None) -> jnp.ndarray:
        """(N,3)→(N,) signed distance (with bias; nerf_network.h:225-232)."""
        return self.sdf_features(params, x, valid_level)[:, 0] + self.net.sdf_bias

    def sdf_and_grad(self, params, x: jnp.ndarray, valid_level=None):
        """sdf plus analytic ∇sdf, both differentiable wrt params and x."""
        def f(xx):
            return self.sdf(params, xx, valid_level)

        sdf, vjp = jax.vjp(f, x)
        # per-sample grads: sdf_i depends only on x_i, so cotangent = ones
        (grad,) = vjp(jnp.ones_like(sdf))
        feats = self.sdf_features(params, x, valid_level)
        return sdf, grad, feats

    # -- full field ---------------------------------------------------------

    def apply(self, params, x: jnp.ndarray, valid_level=None
              ) -> Dict[str, jnp.ndarray]:
        """Full forward: albedo_raw, sdf, grad, variance.

        Mirrors the 16-wide packed output of nerf_network.h:225-250:
        [0:3]=albedo raw, [3]=sdf, [4:7]=∇sdf, [7]=variance, [8:11]=viewdir
        — returned here as a dict (viewdir passthrough is left to callers).
        """
        sdf, grad, feats = self.sdf_and_grad(params, x, valid_level)
        n = x.shape[0]
        zeros_dir = jnp.zeros((n, 16), feats.dtype)
        pad = self.net.rgb_input_dim - (feats.shape[1] + 16 + 3 + 3)
        parts = [feats, zeros_dir, x, grad]
        if pad:
            parts.append(jnp.zeros((n, pad), feats.dtype))
        rgb_in = jnp.concatenate(parts, axis=1)
        rgb_out = apply_mlp(params["rgb_mlp"], rgb_in)
        return {
            "albedo_raw": rgb_out[:, :3],
            "sdf": sdf,
            "grad": grad,
            "variance": params["variance"][0],
        }

    def density(self, params, x: jnp.ndarray, valid_level=None) -> jnp.ndarray:
        """sdf → NeuS density s·σ(s·sdf)·(1−σ(s·sdf))
        (common_operation.cuh:311-328), used for the occupancy grid."""
        sdf = self.sdf(params, x, valid_level)
        s = jnp.exp(10.0 * params["variance"][0])
        sig = jax.nn.sigmoid(sdf * s)
        return s * sig * (1.0 - sig)
