"""Vector-RMW scatter: per element, load a (1,128) row of a VMEM
accumulator, add v*onehot(lane), store back. Tests whether Mosaic can
beat XLA's 6.7 ns/el width-1 scatter floor for hashed levels."""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 1 << 19
H = S // 128           # 4096 rows of 128 lanes
K = 8


def run_scan(op, idx0, extras=(), k=K):
    @jax.jit
    def f(idx0, *extras):
        def body(carry, j):
            idx = (idx0 + j * 977) % S
            out = op(idx, *extras)
            return carry + out.ravel()[0].astype(jnp.float32), 0
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
        return c
    float(f(idx0, *extras))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(f(idx0 + r, *extras))
        ts.append(time.perf_counter() - t0)
    return min(ts) / k * 1e3


def bench(n, TN, unroll):
    def kernel(idx_ref, v_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(j0, _):
            for u in range(unroll):
                j = j0 * unroll + u
                k = idx_ref[j]
                hi = k // 128
                lo = k % 128
                row = out_ref[pl.ds(hi, 1), :]
                add = jnp.where(lane == lo, v_ref[j], 0.0)
                out_ref[pl.ds(hi, 1), :] = row + add
            return 0
        jax.lax.fori_loop(0, TN // unroll, body, 0)

    def op(idx, v):
        return pl.pallas_call(
            kernel,
            grid=(n // TN,),
            in_specs=[
                pl.BlockSpec((TN,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TN,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((H, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, 128), jnp.float32),
        )(idx[:n], v[:n])

    idx0 = jax.random.randint(jax.random.PRNGKey(0), (1 << 21,), 0, S,
                              dtype=jnp.int32)
    v = jnp.ones((n,))
    try:
        ms = run_scan(op, idx0, (v,))
        print(f"vector-RMW scatter n={n} TN={TN} unroll={unroll}: "
              f"{ms:7.2f} ms  {ms*1e6/n:5.2f} ns/el (XLA floor 6.7)")
    except Exception as e:
        print(f"FAILED TN={TN} unroll={unroll}: "
              f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    bench(1 << 19, 1 << 13, 1)
    bench(1 << 19, 1 << 13, 4)
