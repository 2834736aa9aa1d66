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


def _geometric_init_sdf_mlp(key: jax.Array, grid: HashGridConfig,
                            net: NetworkConfig):
    """SAL geometric init (matches utils/mlp_weights.txt structure).

    The first layer is stored as two blocks (xyz block, hash-feature block)
    instead of one padded 48-wide matrix — mathematically identical (the pad
    columns multiply zeros), and it keeps each weight gradient a plain
    matmul, which the TPU compiler handles (a sliced-single-matrix variant
    SIGILLs Mosaic at ≥2^13 batch). tcnn-layout (de)serialization re-joins
    the blocks (train/snapshot.py).
    """
    n_feat = grid.output_dim
    dims = [net.sdf_width] * net.sdf_hidden_layers + [net.n_output_dims]
    keys = jax.random.split(key, len(dims) + 1)
    w_x = ((2.0 ** 0.5) / (net.sdf_width ** 0.5)
           * jax.random.normal(keys[0], (net.sdf_width, 3)))
    w_enc = jnp.zeros((net.sdf_width, n_feat), jnp.float32)
    weights: list = [(w_x.astype(jnp.float32), w_enc)]
    for i in range(1, len(dims)):
        n_in, n_out = dims[i - 1], dims[i]
        if i == len(dims) - 1:
            # output layer: constant sqrt(pi/fan_in) + tiny symmetry noise
            w = (jnp.full((n_out, n_in), (jnp.pi / n_in) ** 0.5)
                 + 1e-5 * jax.random.normal(keys[i], (n_out, n_in)))
        else:
            w = ((2.0 ** 0.5) / (n_out ** 0.5)
                 * jax.random.normal(keys[i], (n_out, n_in)))
        weights.append(w.astype(jnp.float32))
    return weights


def init_params(key: jax.Array, grid: HashGridConfig,
                net: NetworkConfig) -> Dict[str, Any]:
    k_table, k_sdf, k_rgb = jax.random.split(key, 3)
    n_feat = grid.output_dim
    # RGB first layer blocks: [sdf features(16) | xyz(3) | ∇sdf(3)]; the
    # Xavier bound uses the reference's conceptual fan-in of 48
    a = (6.0 / (net.rgb_input_dim + net.rgb_width)) ** 0.5
    ks = jax.random.split(k_rgb, net.rgb_hidden_layers + 3)
    w_feat = jax.random.uniform(ks[0], (net.rgb_width, net.n_output_dims),
                                jnp.float32, -a, a)
    w_xyz = jax.random.uniform(ks[1], (net.rgb_width, 3), jnp.float32, -a, a)
    w_grad = jax.random.uniform(ks[2], (net.rgb_width, 3), jnp.float32, -a, a)
    rgb: list = [(w_feat, w_xyz, w_grad)]
    dims = [net.rgb_width] * net.rgb_hidden_layers + [net.n_output_dims]
    for i in range(1, len(dims)):
        rgb.append(xavier_uniform(ks[2 + i], dims[i], dims[i - 1]))
    return {
        "hash_table": hash_encoding.init_table(k_table, grid),
        "sdf_mlp": _geometric_init_sdf_mlp(k_sdf, grid, net),
        "rgb_mlp": rgb,
        "variance": jnp.full((1,), net.variance_init, jnp.float32),
    }


class NeusField:
    """Stateless apply functions closed over static config."""

    def __init__(self, grid: HashGridConfig, net: NetworkConfig):
        self.grid = grid
        self.net = net
        self.static = hash_encoding.HashGridStatic(grid)
        self._encode_jac_variants: Dict[int, Any] = {}

    def _encode_jac(self, table, x, valid_level, n_active=None):
        key = min(self.grid.n_levels, n_active or self.grid.n_levels)
        if key not in self._encode_jac_variants:
            self._encode_jac_variants[key] = \
                hash_encoding.make_encode_with_jacobian_cv(
                    self.static, key,
                    corner_samples=self.net.stoch_corner_bwd)
        return self._encode_jac_variants[key](table, x, valid_level)

    # -- SDF ---------------------------------------------------------------

    def sdf_features(self, params, x: jnp.ndarray,
                     valid_level=None,
                     n_active: int | None = None) -> jnp.ndarray:
        """(N,3)→(N,16) raw SDF-MLP output (row 0 + bias = sdf).

        The first layer is applied as split matmuls over the [xyz | enc]
        blocks instead of concatenating into the padded 48-wide input:
        mathematically identical (pad columns are zeros), avoids
        materializing the padded input, and sidesteps an XLA-TPU compiler
        crash in the fused concat+relu backward.
        """
        enc = hash_encoding.encode_columns(params["hash_table"], x,
                                           self.static, valid_level,
                                           n_active)
        cd = jnp.dtype(self.net.compute_dtype)
        dot = lambda a, b: jnp.dot(a.astype(cd), b.astype(cd),
                                   preferred_element_type=jnp.float32)
        w_x, w_enc = params["sdf_mlp"][0]
        h = jax.nn.relu(dot(x - 0.5, w_x.T) + dot(enc, w_enc.T))
        return apply_mlp(params["sdf_mlp"][1:], h, compute_dtype=cd)

    def sdf(self, params, x: jnp.ndarray, valid_level=None,
            n_active: int | None = None) -> jnp.ndarray:
        """(N,3)→(N,) signed distance (with bias; nerf_network.h:225-232)."""
        return self.sdf_features(params, x, valid_level,
                                 n_active)[:, 0] + self.net.sdf_bias

    def sdf_and_grad(self, params, x: jnp.ndarray, valid_level=None,
                     n_active: int | None = None,
                     differentiable_positions: bool = False):
        """sdf, analytic ∇sdf, and the 16-wide SDF features — all from ONE
        hash gather, all differentiable wrt params.

        The gradient is closed-form (like the reference's in-pass backward,
        nerf_network.h:163-190): the encoding returns its position-jacobian
        built from the same gathered corner features, and the tiny MLP's
        jacobian is chained through the ReLU masks. No nested autodiff —
        the training loss's outer `jax.grad` differentiates this expression
        directly, which is both the second-order path (d/dparams of ∇sdf)
        and ~2.5× fewer gather/scatter passes than grad-of-grad.
        """
        # custom-VJP encode: row-gather forward, per-feature WIDTH-1
        # scatters in the backward (~8× faster per element than XLA's
        # row-scatter transpose, which otherwise dominates the step);
        # n_active statically skips progressively-locked levels.
        # differentiable_positions routes through the generic (autodiff)
        # encode so gradients flow into x — needed when rays themselves
        # are trainable (global-movement / camera refinement); the custom
        # VJP zeroes the position cotangent for speed.
        if differentiable_positions:
            enc, jac = hash_encoding.encode_with_jacobian(
                params["hash_table"], x, self.static, valid_level)
        else:
            enc, jac = self._encode_jac(params["hash_table"], x,
                                        valid_level, n_active)
        # compute dtype: bf16 matches the reference's fp16 MLP compute
        # (fp32 masters, fp32 accumulation via preferred_element_type);
        # outputs are returned in fp32
        cd = jnp.dtype(self.net.compute_dtype)
        f32 = jnp.float32
        dot = lambda a, b: jnp.dot(a.astype(cd), b.astype(cd),
                                   preferred_element_type=f32)
        w_x, w_enc = params["sdf_mlp"][0]
        pre = dot(x - 0.5, w_x.T) + dot(enc, w_enc.T)
        h = jax.nn.relu(pre)
        act = (pre > 0).astype(h.dtype)
        # position-jacobian of the first hidden layer, one flat (N, H)
        # array per spatial dim (a (N, H, 3) tensor wastes ~95% of the
        # (8,128) vector tiles and forces layout copies; 3 clean matmuls
        # keep the whole chain on the MXU). jac: 3-tuple of (N, L·F).
        jh = [act * (w_x[None, :, d].astype(f32) + dot(jac[d], w_enc.T))
              for d in range(3)]
        # chain through remaining layers
        rest = params["sdf_mlp"][1:]
        for wl in rest[:-1]:
            pre = dot(h, wl.T)
            act = (pre > 0).astype(h.dtype)
            h = jax.nn.relu(pre)
            jh = [act * dot(j, wl.T) for j in jh]
        w_out = rest[-1]
        feats = dot(h, w_out.T)
        sdf = feats[:, 0] + self.net.sdf_bias
        grad = jnp.stack([dot(j, w_out[0]) for j in jh], axis=-1)
        return sdf, grad, feats

    # -- full field ---------------------------------------------------------

    def apply(self, params, x: jnp.ndarray, valid_level=None,
              n_active: int | None = None,
              differentiable_positions: bool = False
              ) -> Dict[str, jnp.ndarray]:
        """Full forward: albedo_raw, sdf, grad, variance.

        Mirrors the 16-wide packed output of nerf_network.h:225-250:
        [0:3]=albedo raw, [3]=sdf, [4:7]=∇sdf, [7]=variance, [8:11]=viewdir
        — returned here as a dict (viewdir passthrough is left to callers).
        """
        sdf, grad, feats = self.sdf_and_grad(params, x, valid_level,
                                             n_active,
                                             differentiable_positions)
        # RGB first layer as split matmuls over the input blocks
        # [feat(16) | dir-encoding(16, never computed → zeros) | xyz | ∇sdf]
        # — identical to the reference's packed 48-wide input, minus the
        # dead dir block's FLOPs.
        cd = jnp.dtype(self.net.compute_dtype)
        dot = lambda a, b: jnp.dot(a.astype(cd), b.astype(cd),
                                   preferred_element_type=jnp.float32)
        w_feat, w_xyz, w_grad = params["rgb_mlp"][0]
        h = jax.nn.relu(dot(feats, w_feat.T) + dot(x, w_xyz.T)
                        + dot(grad, w_grad.T))
        rgb_out = apply_mlp(params["rgb_mlp"][1:], h, compute_dtype=cd)
        return {
            "albedo_raw": rgb_out[:, :3],
            "sdf": sdf,
            "grad": grad,
            "variance": params["variance"][0],
        }

    def apply_chunked(self, params, x: jnp.ndarray, valid_level=None,
                      chunk: int = 4096,
                      n_active: int | None = None) -> Dict[str, jnp.ndarray]:
        """apply() in fixed-size chunks via lax.map.

        Two reasons: (a) bounds the live intermediates of the 14-level
        gather (the XLA-TPU compiler SIGILLs on the fused gather+MLP
        backward above ~2^12 rows); (b) caps peak memory for huge
        marching-cubes batches. Semantically identical to apply().
        """
        n = x.shape[0]
        if n <= chunk:
            return self.apply(params, x, valid_level, n_active)
        assert n % chunk == 0, (n, chunk)
        outs = jax.lax.map(
            lambda xx: self.apply(params, xx, valid_level, n_active),
            x.reshape(-1, chunk, 3))
        return {
            "albedo_raw": outs["albedo_raw"].reshape(n, 3),
            "sdf": outs["sdf"].reshape(n),
            "grad": outs["grad"].reshape(n, 3),
            "variance": outs["variance"][0],
        }

    def density(self, params, x: jnp.ndarray, valid_level=None,
                n_active: int | None = None) -> jnp.ndarray:
        """sdf → NeuS density s·σ(s·sdf)·(1−σ(s·sdf))
        (common_operation.cuh:311-328), used for the occupancy grid."""
        sdf = self.sdf(params, x, valid_level, n_active)
        s = jnp.exp(10.0 * params["variance"][0])
        sig = jax.nn.sigmoid(sdf * s)
        return s * sig * (1.0 - sig)
