"""Microbench candidate primitives for breaking the encode-backward
scatter wall (round-2). All timings with VARYING inputs per rep (the
axon runtime memoizes identical executions — see DESIGN.md caveat).

Usage: python tools/profiling/_bench_primitives.py [section ...]
Sections: scatter gather sort pallas_onehot pallas_scalar misc
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_EL = 1 << 21          # ~2M source elements (2^18 samples x 8 corners)
S_BIG = 1 << 19         # hashed-level table size
REPS = 4
VARIANTS = 4            # distinct input sets cycled to defeat memoization


def _leaf0(x):
    return jax.tree_util.tree_leaves(x)[0]


def timed(fn, args_list, reps=REPS):
    """Chain each rep's first arg on the previous output: the axon runtime
    memoizes executions aggressively, so inputs must genuinely differ AND
    depend on prior results to force real sequential device work."""
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    carry = (_leaf0(out).ravel()[0] * 0).astype(jnp.float32)
    t0 = time.perf_counter()
    for i in range(reps):
        a0, *rest = args_list[i % len(args_list)]
        a0 = a0 + carry.astype(a0.dtype)
        out = fn(a0, *rest)
        carry = (_leaf0(out).ravel()[0] * 0).astype(jnp.float32)
    jax.block_until_ready(out)
    float(carry)
    return (time.perf_counter() - t0) / reps * 1e3


def make_idx(n, s, seed):
    return jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, s,
                              dtype=jnp.int32)


def bench_scatter():
    print("== scatter cost vs row width (dst 2^19 x W), fp32 ==")
    for w in (2, 4, 8, 16, 32, 128):
        # keep SOURCE ELEMENT count constant at N_EL: rows = N_EL / w
        n_rows = N_EL // w

        @jax.jit
        def f(idx, v, w=w, n_rows=n_rows):
            dst = jnp.zeros((S_BIG, w), jnp.float32)
            return dst.at[idx].add(v, mode="drop")

        args = [(make_idx(n_rows, S_BIG, 7 * i), jnp.ones((n_rows, w)))
                for i in range(VARIANTS)]
        ms = timed(f, args)
        print(f"  rows-of-{w:<3} rows={n_rows:>8}  {ms:7.2f} ms  "
              f"{ms * 1e6 / n_rows:6.1f} ns/row  {ms * 1e6 / N_EL:5.2f} ns/el")

    print("== width-1 scatter, source count sweep ==")
    for n in (1 << 17, 1 << 19, 1 << 21):
        @jax.jit
        def f(idx, v):
            return jnp.zeros((S_BIG,), jnp.float32).at[idx].add(v, mode="drop")
        args = [(make_idx(n, S_BIG, 11 * i), jnp.ones((n,)))
                for i in range(VARIANTS)]
        ms = timed(f, args)
        print(f"  n={n:>8}  {ms:7.2f} ms  {ms * 1e6 / n:5.2f} ns/el")

    print("== width-1 scatter bf16 vs fp32, 2M els ==")
    for dt in (jnp.float32, jnp.bfloat16):
        @jax.jit
        def f(idx, v, dt=dt):
            return jnp.zeros((S_BIG,), dt).at[idx].add(v, mode="drop")
        args = [(make_idx(N_EL, S_BIG, 13 * i),
                 jnp.ones((N_EL,), dt)) for i in range(VARIANTS)]
        print(f"  {dt.__name__:9} {timed(f, args):7.2f} ms")

    print("== width-1 scatter with SORTED indices (2M els) ==")

    @jax.jit
    def fsorted(idx, v):
        return jnp.zeros((S_BIG,), jnp.float32).at[idx].add(
            v, mode="drop", indices_are_sorted=True)
    args = [(jnp.sort(make_idx(N_EL, S_BIG, 17 * i)), jnp.ones((N_EL,)))
            for i in range(VARIANTS)]
    print(f"  sorted+flag {timed(fsorted, args):7.2f} ms")

    @jax.jit
    def fseg(idx, v):
        return jax.ops.segment_sum(v, idx, num_segments=S_BIG,
                                   indices_are_sorted=True)
    print(f"  sorted segment_sum {timed(fseg, args):7.2f} ms")


def bench_gather():
    print("== gather cost vs row width (src 2^19 x W), fp32 ==")
    for w in (2, 4, 8, 16, 32, 128, 256):
        n_rows = N_EL // max(w, 1)

        @jax.jit
        def f(tab, idx):
            return tab[idx]
        args = [(jnp.ones((S_BIG, w)), make_idx(n_rows, S_BIG, 19 * i))
                for i in range(VARIANTS)]
        ms = timed(f, args)
        print(f"  rows-of-{w:<3} rows={n_rows:>8}  {ms:7.2f} ms  "
              f"{ms * 1e6 / n_rows:6.1f} ns/row")
    print("== gather 2M rows at widths (cost per ROW constant?) ==")
    for w in (2, 8, 16):
        @jax.jit
        def f(tab, idx):
            return tab[idx]
        args = [(jnp.ones((S_BIG, w)), make_idx(N_EL, S_BIG, 23 * i))
                for i in range(VARIANTS)]
        ms = timed(f, args)
        print(f"  rows-of-{w:<3} rows={N_EL:>8}  {ms:7.2f} ms  "
              f"{ms * 1e6 / N_EL:6.1f} ns/row")


def bench_sort():
    print("== jax.lax.sort_key_val 2M uint32 keys + f32 payload ==")

    @jax.jit
    def f(k, v):
        return jax.lax.sort_key_val(k, v)
    args = [(make_idx(N_EL, S_BIG, 29 * i).astype(jnp.uint32),
             jnp.ones((N_EL,))) for i in range(VARIANTS)]
    print(f"  sort_key_val {timed(f, args, reps=4):7.2f} ms")

    print("== argsort 2M int32 ==")

    @jax.jit
    def g(k):
        return jnp.argsort(k)
    args = [(make_idx(N_EL, S_BIG, 31 * i),) for i in range(VARIANTS)]
    print(f"  argsort {timed(g, args, reps=4):7.2f} ms")


def bench_misc():
    print("== cumsum 2M fp32 ==")

    @jax.jit
    def f(x):
        return jnp.cumsum(x)
    args = [(jnp.ones((N_EL,)) * i,) for i in range(VARIANTS)]
    print(f"  cumsum {timed(f, args):7.2f} ms")

    print("== one-hot matmul grad, S=4096, 2M els, XLA (no pallas) ==")

    @jax.jit
    def g(idx, v):
        # (S/128, 128*2) accumulation via blocked einsum; XLA materializes
        # the one-hot; expect HBM-traffic-bound
        oh = jax.nn.one_hot(idx, 4096, dtype=jnp.bfloat16)  # (N, 4096)
        return oh.T @ v.astype(jnp.bfloat16)
    args = [(make_idx(N_EL // 8, 4096, 37 * i),
             jnp.ones((N_EL // 8, 2))) for i in range(VARIANTS)]
    print(f"  onehot.T@v (256K els) {timed(g, args, reps=2):7.2f} ms")


def bench_pallas_onehot():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("== pallas one-hot MXU scatter-grad ==")
    # acc layout: (H, 128, F) flattened (H, 128*F), f-blocked:
    #   acc[h, lo + 128*f] = sum over elements with idx_hi==h, idx_lo==lo
    TN = 2048

    def make_fn(S, n_el, F=2):
        H = S // 128

        def kernel(idx_ref, v_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            idx = idx_ref[:]                       # (TN,) int32
            v = v_ref[:]                           # (TN, F)
            hi = idx // 128
            lo = idx % 128
            lane = jax.lax.broadcasted_iota(jnp.int32, (TN, 128), 1)
            oh_lo = (lane == lo[:, None]).astype(jnp.float32)
            m = jnp.concatenate([oh_lo * v[:, f:f + 1] for f in range(F)],
                                axis=1)            # (TN, 128F)
            nh = H // 128 if H % 128 == 0 else H // 128 + 1

            def body(h, _):
                hrow = jax.lax.broadcasted_iota(jnp.int32, (TN, 128), 1) \
                    + h * 128
                oh_hi = (hrow == hi[:, None]).astype(jnp.float32)
                blk = jax.lax.dot_general(
                    oh_hi, m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (128, 128F)
                out_ref[pl.ds(h * 128, 128), :] += blk
                return 0

            jax.lax.fori_loop(0, nh, body, 0)

        Hpad = max(H, 128) if H % 128 else H

        @jax.jit
        def run(idx, v):
            return pl.pallas_call(
                kernel,
                grid=(n_el // TN,),
                in_specs=[
                    pl.BlockSpec((TN,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((TN, F), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Hpad, 128 * F), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Hpad, 128 * F),
                                               jnp.float32),
            )(idx, v)
        return run

    for S in (4096, 16384, 131072, S_BIG):
        try:
            fn = make_fn(S, N_EL)
            args = [(make_idx(N_EL, S, 41 * i), jnp.ones((N_EL, 2)))
                    for i in range(VARIANTS)]
            ms = timed(fn, args, reps=4)
            scatter_ms = N_EL * 2 * 8e-6
            print(f"  S={S:>7}  {ms:7.2f} ms   (scatter equiv ~{scatter_ms:.0f} ms)")
        except Exception as e:
            print(f"  S={S:>7}  FAILED: {type(e).__name__}: {e}")


def bench_pallas_scalar():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("== pallas scalar-loop scatter into VMEM acc ==")
    TN = 4096

    def make_fn(S, n_el):
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

        @jax.jit
        def run(idx, v):
            return pl.pallas_call(
                kernel,
                grid=(n_el // TN,),
                in_specs=[
                    pl.BlockSpec((TN,), lambda i: (i,),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((TN,), lambda i: (i,),
                                 memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((S, 1), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((S, 1), jnp.float32),
            )(idx, v)
        return run

    n_small = 1 << 18
    for S in (4096, S_BIG):
        try:
            fn = make_fn(S, n_small)
            args = [(make_idx(n_small, S, 43 * i), jnp.ones((n_small,)))
                    for i in range(VARIANTS)]
            ms = timed(fn, args, reps=2)
            print(f"  S={S:>7} n={n_small}  {ms:7.2f} ms  "
                  f"{ms * 1e6 / n_small:5.2f} ns/el")
        except Exception as e:
            print(f"  S={S:>7}  FAILED: {type(e).__name__}: {e}")


SECTIONS = dict(scatter=bench_scatter, gather=bench_gather,
                sort=bench_sort, misc=bench_misc,
                pallas_onehot=bench_pallas_onehot,
                pallas_scalar=bench_pallas_scalar)

if __name__ == "__main__":
    which = sys.argv[1:] or list(SECTIONS)
    print("device:", jax.devices()[0])
    for name in which:
        SECTIONS[name]()
