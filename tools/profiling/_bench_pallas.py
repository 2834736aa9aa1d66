"""Pallas scatter experiments vs the XLA 6.7ns/el width-1 floor.
Scan-based methodology (see _bench_primitives2)."""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_EL = 1 << 21
K = 8


def run_scan(op, idx0, extras=(), k=K, S=1 << 19):
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


def bench_scalar_loop():
    """fori_loop of scalar RMW into a VMEM accumulator."""
    S = 1 << 19
    n = 1 << 19          # smaller element count for a first signal
    TN = 1 << 13

    def kernel(idx_ref, v_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(j, _):
            k = idx_ref[j]
            out_ref[k, 0] += v_ref[j]
            return 0
        jax.lax.fori_loop(0, TN, body, 0)

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
            out_specs=pl.BlockSpec((S, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, 1), jnp.float32),
        )(idx[:n], v)

    idx0 = jax.random.randint(jax.random.PRNGKey(0), (N_EL,), 0, S,
                              dtype=jnp.int32)
    v = jnp.ones((n,))
    try:
        ms = run_scan(op, idx0, (v,), S=S)
        print(f"pallas scalar-loop scatter {n} els: {ms:7.2f} ms  "
              f"{ms*1e6/n:5.2f} ns/el   (XLA floor 6.7)")
    except Exception as e:
        print(f"pallas scalar-loop FAILED: {type(e).__name__}: {e}")


def bench_onehot_mxu():
    """One-hot MXU scatter-grad for SMALL dense tables (levels 0-2)."""
    n = N_EL

    def make(S):
        H = max(S // 128, 8)
        TN = 1 << 11

        def kernel(idx_ref, v_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            idx = idx_ref[:]
            v = v_ref[:]
            hi = idx // 128
            lo = idx % 128
            lane = jax.lax.broadcasted_iota(jnp.int32, (TN, 128), 1)
            oh_lo = (lane == lo[:, None]).astype(jnp.float32)
            m = jnp.concatenate([oh_lo * v[:, 0:1], oh_lo * v[:, 1:2]],
                                axis=1)                     # (TN, 256)
            nh = (H + 127) // 128

            def body(h, _):
                hrow = jax.lax.broadcasted_iota(jnp.int32, (TN, 128), 1) \
                    + h * 128
                oh_hi = (hrow == hi[:, None]).astype(jnp.float32)
                blk = jax.lax.dot_general(
                    oh_hi, m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # (128, 256)
                out_ref[pl.ds(h * 128, 128), :] += blk
                return 0
            jax.lax.fori_loop(0, nh, body, 0)

        Hpad = ((H + 127) // 128) * 128

        def op(idx, v):
            return pl.pallas_call(
                kernel,
                grid=(n // TN,),
                in_specs=[
                    pl.BlockSpec((TN,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TN, 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Hpad, 256), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Hpad, 256), jnp.float32),
            )(idx, v)
        return op

    for S in (4096, 16384, 65536):
        idx0 = jax.random.randint(jax.random.PRNGKey(1), (N_EL,), 0, S,
                                  dtype=jnp.int32)
        v = jnp.ones((n, 2))
        try:
            ms = run_scan(make(S), idx0, (v,), S=S)
            print(f"pallas one-hot MXU S={S:>6}: {ms:7.2f} ms  "
                  f"(2x width-1 equiv ~28 ms)")
        except Exception as e:
            print(f"pallas one-hot S={S} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["scalar", "onehot"]
    print("device:", jax.devices()[0])
    if "scalar" in which:
        bench_scalar_loop()
    if "onehot" in which:
        bench_onehot_mxu()
