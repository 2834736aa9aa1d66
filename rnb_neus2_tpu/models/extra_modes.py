"""Inherited instant-ngp testbed workloads: image / mesh-SDF / volume
fitting (reference: src/testbed_image.cu, testbed_sdf.cu,
testbed_volume.cu, selected by ETestbedMode; the RNb pipeline always runs
Nerf mode but the capabilities ship with the testbed).

Each mode is a compact field + jitted fit loop on the shared hash-grid
machinery:

- ImageField: 2D multires hash grid + MLP fitting RGB(A) images
  (train_image, testbed_image.cu:220);
- SdfField: NeusField's SDF branch fit to ground-truth mesh distances
  (BVH closest-point + ray-stab sign, like testbed_sdf.cu's
  TriangleBvh-based training data) with IoU evaluation;
- VolumeField: density fit to a dense voxel grid (the reference reads
  NanoVDB; we accept any dense array — NanoVDB parsing is IO, not
  modeling).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import HashGridConfig, NetworkConfig
from ..ops import hash_encoding
from ..ops.mlp import apply_mlp, init_mlp

_PRIMES_2D = (1, 2654435761)


class Hash2D:
    """2D variant of the multires hash encoding (for image fitting)."""

    def __init__(self, n_levels=8, f=2, log2_size=16, base=16, top=1024):
        import math

        self.n_levels, self.f = n_levels, f
        s = math.exp(math.log(top / base) / max(n_levels - 1, 1))
        self.scales, self.sizes, self.offsets, self.hashed = [], [], [], []
        off = 0
        for l in range(n_levels):
            scale = base * s ** l - 1.0
            res = int(np.ceil(scale)) + 1
            dense = -(-res * res // 8) * 8
            size = min(dense, 1 << log2_size)
            self.scales.append(float(res - 1))
            self.sizes.append(size)
            self.offsets.append(off)
            self.hashed.append(res * res > size)
            off += size
        self.n_entries = off

    def init_table(self, key):
        return jax.random.uniform(key, (self.n_entries, self.f),
                                  minval=-1e-4, maxval=1e-4)

    def encode(self, table, xy):
        outs = []
        corners = jnp.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], jnp.int32)
        for l in range(self.n_levels):
            p = xy * self.scales[l] + 0.5
            p0 = jnp.floor(p)
            frac = p - p0
            cpos = p0.astype(jnp.int32)[:, None, :] + corners[None]
            if self.hashed[l]:
                h = (cpos[..., 0].astype(jnp.uint32)
                     ^ (cpos[..., 1].astype(jnp.uint32)
                        * jnp.uint32(_PRIMES_2D[1])))
                idx = (h % jnp.uint32(self.sizes[l])).astype(jnp.int32)
            else:
                res = int(self.scales[l]) + 1
                idx = (cpos[..., 0] + cpos[..., 1] * res) % self.sizes[l]
            feats = table[idx + self.offsets[l]]
            w = jnp.prod(jnp.where(corners[None] > 0, frac[:, None, :],
                                   1 - frac[:, None, :]), axis=-1)
            outs.append(jnp.sum(feats * w[..., None], axis=1))
        return jnp.concatenate(outs, axis=1)


class ImageField:
    """2D image fitting (testbed_image.cu train_image)."""

    def __init__(self, n_channels=3, width=64):
        self.enc = Hash2D()
        self.n_channels = n_channels
        self.width = width

    def init(self, key):
        k1, k2 = jax.random.split(key)
        dims = [self.enc.n_levels * self.enc.f, self.width, self.width,
                self.n_channels]
        return {"table": self.enc.init_table(k1),
                "mlp": init_mlp(k2, dims)}

    def apply(self, params, xy):
        return apply_mlp(params["mlp"], self.enc.encode(params["table"],
                                                        xy))

    def fit(self, image: np.ndarray, n_steps=500, batch=1 << 14, lr=1e-2,
            seed=0, params=None, state=None, return_state=False):
        H, W, C = image.shape
        img = jnp.asarray(image)
        tx = optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)
        if params is None:
            params = self.init(jax.random.PRNGKey(seed))
        if state is None:
            state = tx.init(params)

        @jax.jit
        def step(p, s, key):
            xy = jax.random.uniform(key, (batch, 2))
            px = jnp.clip((xy[:, 0] * W).astype(jnp.int32), 0, W - 1)
            py = jnp.clip((xy[:, 1] * H).astype(jnp.int32), 0, H - 1)
            target = img[py, px]

            def loss(pp):
                return jnp.mean((self.apply(pp, xy) - target) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            up, s = tx.update(g, s, p)
            return optax.apply_updates(p, up), s, l

        key = jax.random.PRNGKey(seed + 1)
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            params, state, l = step(params, state, k)
        if return_state:
            return params, state, float(l)
        return params, float(l)

    def render(self, params, W, H):
        ys, xs = np.mgrid[0:H, 0:W]
        xy = jnp.asarray(np.stack([(xs.ravel() + 0.5) / W,
                                   (ys.ravel() + 0.5) / H], 1), jnp.float32)
        return np.asarray(self.apply(params, xy)).reshape(H, W, -1)


class SdfField:
    """Mesh-SDF fitting (testbed_sdf.cu): GT distances from the native BVH
    (closest point + parity sign), surface-biased sampling, IoU eval.

    encoding: "hash" (default; the full NeuS hash-grid field) or
    "takikawa" — the octree feature encoding the reference selects via
    the SDF config's Takikawa otype (testbed.cu:2423,2654; see
    ops/takikawa.py), followed by a small MLP.
    """

    def __init__(self, grid: HashGridConfig | None = None,
                 net: NetworkConfig | None = None,
                 encoding: str = "hash", octree_depth: int = 7,
                 octree_starting_level: int = 3):
        from .neus_field import NeusField, init_params

        self.encoding = encoding
        self.grid = grid or HashGridConfig(n_levels=8, top_resolution=256)
        self.net = net or NetworkConfig()
        self.field = NeusField(self.grid, self.net)
        self._init_params = init_params
        self.octree_depth = octree_depth
        self.octree_starting_level = octree_starting_level
        self.octree = None

    def _sdf(self, params, pts):
        if self.encoding == "takikawa":
            from ..ops import takikawa
            from ..ops.mlp import apply_mlp
            enc = takikawa.encode(params["table"], pts, self.octree)
            return apply_mlp(params["mlp"], enc)[:, 0]
        return self.field.sdf(params, pts)

    def fit(self, vertices, faces, n_steps=400, batch=1 << 13, lr=1e-3,
            seed=0, surface_frac=0.5, params=None, state=None,
            return_state=False):
        from ..io.raycast import RayCaster

        caster = self.caster if getattr(self, "caster", None) is not None \
            else RayCaster(vertices, faces)
        rng = np.random.default_rng(seed)
        if params is None:
            if self.encoding == "takikawa":
                from ..ops import takikawa
                from ..ops.mlp import xavier_uniform
                self.octree = takikawa.build_triangle_octree(
                    vertices, faces, self.octree_depth,
                    self.octree_starting_level)
                ks = jax.random.split(jax.random.PRNGKey(seed), 4)
                n_in = self.octree.n_output_dims
                params = {
                    "table": takikawa.init_takikawa_params(ks[0],
                                                           self.octree),
                    "mlp": [xavier_uniform(ks[1], 64, n_in),
                            xavier_uniform(ks[2], 64, 64),
                            xavier_uniform(ks[3], 1, 64)],
                }
            else:
                params = self._init_params(jax.random.PRNGKey(seed),
                                           self.grid, self.net)
        tx = optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)
        if state is None:
            state = tx.init(params)

        tri = np.asarray(vertices)[np.asarray(faces)]

        def sample_points(n):
            ns = int(n * surface_frac)
            # surface-biased: random barycentric points + gaussian offset
            fi = rng.integers(0, len(tri), ns)
            u = rng.random((ns, 2))
            flip = u.sum(1) > 1
            u[flip] = 1 - u[flip]
            p = (tri[fi, 0] + u[:, :1] * (tri[fi, 1] - tri[fi, 0])
                 + u[:, 1:] * (tri[fi, 2] - tri[fi, 0]))
            p = p + rng.normal(scale=0.02, size=p.shape)
            q = rng.random((n - ns, 3))
            return np.clip(np.concatenate([p, q], 0), 0, 1
                           ).astype(np.float32)

        @jax.jit
        def step(p, s, pts, target):
            def loss(pp):
                pred = self._sdf(pp, pts)
                return jnp.mean((pred - target) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            up, s = tx.update(g, s, p)
            return optax.apply_updates(p, up), s, l

        for _ in range(n_steps):
            pts = sample_points(batch)
            target = jnp.asarray(caster.signed_distance(pts))
            params, state, l = step(params, state, jnp.asarray(pts), target)
        self.params = params
        self.caster = caster
        if return_state:
            return params, state, float(l)
        return params, float(l)

    def render(self, params=None, W=256, H=256, mode="shade", **kw):
        """Sphere-traced render frame (testbed_sdf.cu render_sdf +
        shade_kernel_sdf): modes shade/normals/depth/ao/positions/cost.
        Returns (H, W, 4) float RGBA."""
        from ..render.sdf_volume_render import render_sdf
        params = self.params if params is None else params
        rgba, _ = render_sdf(lambda p: self._sdf(params, p), W, H,
                             mode=mode, **kw)
        return np.asarray(rgba)

    def calculate_iou(self, n_samples=1 << 15, seed=0) -> float:
        """Volumetric IoU vs the GT mesh (Testbed::calculate_iou)."""
        rng = np.random.default_rng(seed)
        pts = rng.random((n_samples, 3)).astype(np.float32)
        pred = np.asarray(self._sdf(self.params, jnp.asarray(pts))) < 0
        gt = self.caster.signed_distance(pts) < 0
        return float((pred & gt).sum()) / max(float((pred | gt).sum()), 1.0)


class VolumeField:
    """Dense-volume density fitting (testbed_volume.cu train_volume)."""

    def __init__(self, grid: HashGridConfig | None = None, width=64):
        self.grid = grid or HashGridConfig(n_levels=8, top_resolution=256)
        self.static = hash_encoding.HashGridStatic(self.grid)
        self.width = width

    def init(self, key):
        k1, k2 = jax.random.split(key)
        dims = [self.grid.output_dim, self.width, self.width, 1]
        return {"table": hash_encoding.init_table(k1, self.grid),
                "mlp": init_mlp(k2, dims)}

    def apply(self, params, pts):
        enc = hash_encoding.encode(params["table"], pts, self.static)
        # Exponential density activation (testbed_volume.cu)
        return jnp.exp(jnp.clip(
            apply_mlp(params["mlp"], enc)[:, 0], -10.0, 10.0))

    def fit(self, volume: np.ndarray, n_steps=400, batch=1 << 13, lr=1e-2,
            seed=0, params=None, state=None, return_state=False):
        vol = jnp.asarray(volume, jnp.float32)
        X, Y, Z = volume.shape
        tx = optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)
        if params is None:
            params = self.init(jax.random.PRNGKey(seed))
        if state is None:
            state = tx.init(params)

        @jax.jit
        def step(p, s, key):
            pts = jax.random.uniform(key, (batch, 3))
            ijk = jnp.minimum((pts * jnp.asarray([X, Y, Z])).astype(
                jnp.int32), jnp.asarray([X - 1, Y - 1, Z - 1]))
            target = vol[ijk[:, 0], ijk[:, 1], ijk[:, 2]]

            def loss(pp):
                return jnp.mean((self.apply(pp, pts) - target) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            up, s = tx.update(g, s, p)
            return optax.apply_updates(p, up), s, l

        key = jax.random.PRNGKey(seed + 1)
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            params, state, l = step(params, state, k)
        self.params = params
        if return_state:
            return params, state, float(l)
        return params, float(l)

    def render(self, params=None, W=256, H=256, **kw):
        """Ratio-tracked render frame of the fitted density
        (volume_render_kernel_step, testbed_volume.cu:330-392) against
        the procedural sun/sky envmap. Returns (H, W, 4) float RGBA."""
        from ..render.sdf_volume_render import render_volume
        params = self.params if params is None else params
        rgba = render_volume(lambda p: self.apply(params, p), W, H, **kw)
        return np.asarray(rgba)
