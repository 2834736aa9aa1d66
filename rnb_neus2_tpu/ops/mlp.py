"""Bias-free MLPs as plain parameter pytrees.

The reference runs tiny-cuda-nn FullyFusedMLPs (fp16 tensor cores, width 64,
no biases; `networks/fully_fused_mlp.h`). On TPU these are ordinary XLA
matmuls that fuse with their surrounding elementwise ops; the MXU handles
them natively in bf16/fp32 — no hand-fused kernel needed. Double-backward
(the reference's `backward_backward_input_impl`,
`src/fully_fused_mlp.cu:1037-1239`) falls out of `jax.grad` for free.

Weights are stored [out, in] like tcnn; init is Xavier-uniform
(`fully_fused_mlp.cu:1190`) unless overridden (geometric init — see
models/neus_field.py).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, n_out: int, n_in: int,
                   dtype=jnp.float32) -> jax.Array:
    a = (6.0 / (n_in + n_out)) ** 0.5
    return jax.random.uniform(key, (n_out, n_in), dtype, -a, a)


def init_mlp(key: jax.Array, dims: Sequence[int], dtype=jnp.float32
             ) -> List[jax.Array]:
    """dims = [in, hidden..., out]; returns list of [out, in] weight matrices."""
    keys = jax.random.split(key, len(dims) - 1)
    return [xavier_uniform(k, dims[i + 1], dims[i], dtype)
            for i, k in enumerate(keys)]


def apply_mlp(weights: Sequence[jax.Array], x: jnp.ndarray,
              compute_dtype=None) -> jnp.ndarray:
    """ReLU hidden activations, linear output (base.json network sections)."""
    h = x
    n = len(weights)
    for i, w in enumerate(weights):
        if compute_dtype is not None:
            h = jnp.dot(h.astype(compute_dtype), w.T.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
        else:
            h = jnp.dot(h, w.T, preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jax.nn.relu(h)
    return h
