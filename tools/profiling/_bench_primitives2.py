"""Microbench primitives INSIDE one jit (lax.scan of K iterations with
per-iteration varying indices) — the only reliable methodology on the
axon tunnel (single dispatches are noise-dominated; identical executions
are memoized). Reports per-op cost = (t_total - t_base) / K.

Usage: python tools/profiling/_bench_primitives2.py [section ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_EL = 1 << 21
S_BIG = 1 << 19
K = 16


def run_scan(op, idx0, extras=(), k=K):
    """Scan op k times; idx varies per iteration via +j rotation."""
    @jax.jit
    def f(idx0, *extras):
        def body(carry, j):
            idx = (idx0 + j * 977) % S_BIG
            out = op(idx, *extras)
            return carry + out.ravel()[0].astype(jnp.float32), 0
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
        return c

    # warm + compile
    float(f(idx0, *extras))
    reps = 3
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(f(idx0 + r, *extras))
        ts.append(time.perf_counter() - t0)
    return min(ts) / k * 1e3


def baseline_ms(idx0):
    return run_scan(lambda idx: idx[:8].astype(jnp.float32), idx0)


def bench_scatter():
    idx0 = jax.random.randint(jax.random.PRNGKey(0), (N_EL,), 0, S_BIG,
                              dtype=jnp.int32)
    base = run_scan(lambda idx: idx[:8].astype(jnp.float32), idx0)
    print(f"scan overhead baseline: {base:.2f} ms/iter")

    v1 = jnp.ones((N_EL,))
    ms = run_scan(lambda idx, v: jnp.zeros((S_BIG,), jnp.float32)
                  .at[idx].add(v, mode="drop"), idx0, (v1,)) - base
    print(f"width-1 1-D scatter 2M els: {ms:7.2f} ms  {ms*1e6/N_EL:5.2f} ns/el")

    for w in (2, 4, 8, 16, 32):
        n_rows = N_EL // w
        vr = jnp.ones((n_rows, w))
        ms = run_scan(lambda idx, v, w=w, n=n_rows:
                      jnp.zeros((S_BIG, w), jnp.float32)
                      .at[idx[:n]].add(v, mode="drop"), idx0, (vr,)) - base
        print(f"rows-of-{w:<3} scatter {n_rows:>8} rows: {ms:7.2f} ms  "
              f"{ms*1e6/n_rows:6.1f} ns/row  {ms*1e6/N_EL:5.2f} ns/el")

    # two width-1 scatters (the real per-level cost, F=2)
    ms = run_scan(lambda idx, v: (jnp.zeros((S_BIG,), jnp.float32)
                                  .at[idx].add(v, mode="drop")
                                  + jnp.zeros((S_BIG,), jnp.float32)
                                  .at[idx].add(v * 2, mode="drop")),
                  idx0, (v1,)) - base
    print(f"2x width-1 scatter (one level, F=2): {ms:7.2f} ms")

    # sorted
    ms = run_scan(lambda idx, v: jnp.zeros((S_BIG,), jnp.float32)
                  .at[jnp.sort(idx)].add(v, mode="drop",
                                         indices_are_sorted=True),
                  idx0, (v1,)) - base
    print(f"sort+sorted-scatter 2M els: {ms:7.2f} ms")

    ms = run_scan(lambda idx, v: jax.ops.segment_sum(
        v, idx, num_segments=S_BIG, indices_are_sorted=True),
        jnp.sort(idx0), (v1,)) - base
    print(f"presorted segment_sum(flag) 2M els: {ms:7.2f} ms "
          f"(NOTE idx rotation breaks sortedness: lower bound only)")


def bench_gather():
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N_EL,), 0, S_BIG,
                              dtype=jnp.int32)
    base = run_scan(lambda idx: idx[:8].astype(jnp.float32), idx0)
    print(f"scan overhead baseline: {base:.2f} ms/iter")
    for w in (2, 8, 16, 32, 128, 256):
        tab = jnp.ones((S_BIG, w))
        n_rows = N_EL // max(w // 2, 1)
        n_rows = min(n_rows, N_EL)
        ms = run_scan(lambda idx, t, n=n_rows: t[idx[:n]], idx0,
                      (tab,)) - base
        print(f"gather rows-of-{w:<3} {n_rows:>8} rows: {ms:7.2f} ms  "
              f"{ms*1e6/n_rows:6.2f} ns/row")
    # gather SAME row count at different widths
    for w in (2, 16, 256):
        tab = jnp.ones((S_BIG, w))
        n_rows = 1 << 18
        ms = run_scan(lambda idx, t, n=n_rows: t[idx[:n]], idx0,
                      (tab,)) - base
        print(f"gather rows-of-{w:<3} {n_rows:>8} rows: {ms:7.2f} ms  "
              f"{ms*1e6/n_rows:6.2f} ns/row")


def bench_sort():
    idx0 = jax.random.randint(jax.random.PRNGKey(2), (N_EL,), 0, S_BIG,
                              dtype=jnp.int32)
    base = run_scan(lambda idx: idx[:8].astype(jnp.float32), idx0)
    v = jnp.ones((N_EL,))
    ms = run_scan(lambda idx, v: jax.lax.sort_key_val(idx, v)[1],
                  idx0, (v,), k=4) - base
    print(f"sort_key_val 2M: {ms:7.2f} ms")
    ms = run_scan(lambda idx: jnp.cumsum(idx.astype(jnp.float32)),
                  idx0) - base
    print(f"cumsum 2M: {ms:7.2f} ms")


SECTIONS = dict(scatter=bench_scatter, gather=bench_gather,
                sort=bench_sort)


def bench_sharded():
    """Scatter into B disjoint accumulator shards (vmap over leading dim):
    if XLA's scatter loop is RMW-latency-chained, B independent
    destinations may pipeline B-way."""
    idx0 = jax.random.randint(jax.random.PRNGKey(3), (N_EL,), 0, S_BIG,
                              dtype=jnp.int32)
    base = run_scan(lambda idx: idx[:8].astype(jnp.float32), idx0)
    print(f"baseline {base:.2f} ms")
    v = jnp.ones((N_EL,))
    for B in (1, 4, 16, 64):
        def op(idx, v, B=B):
            idx2 = idx.reshape(B, N_EL // B)
            v2 = v.reshape(B, N_EL // B)
            out = jax.vmap(lambda i, x: jnp.zeros((S_BIG,), jnp.float32)
                           .at[i].add(x, mode="drop"))(idx2, v2)
            return out.sum(0)
        ms = run_scan(op, idx0, (v,)) - base
        print(f"  B={B:<3} sharded width-1 scatter 2M els: {ms:7.2f} ms  "
              f"{ms*1e6/N_EL:5.2f} ns/el")
    # rows-of-16 sharded
    n_rows = N_EL // 16
    vr = jnp.ones((n_rows, 16))
    for B in (4, 16):
        def op(idx, v, B=B):
            idx2 = idx[:n_rows].reshape(B, n_rows // B)
            v2 = v.reshape(B, n_rows // B, 16)
            out = jax.vmap(lambda i, x: jnp.zeros((S_BIG, 16), jnp.float32)
                           .at[i].add(x, mode="drop"))(idx2, v2)
            return out.sum(0)
        ms = run_scan(op, idx0, (vr,)) - base
        print(f"  B={B:<3} sharded rows-16 scatter {n_rows} rows: {ms:7.2f} ms"
              f"  {ms*1e6/n_rows:6.1f} ns/row")


def bench_slice_gather():
    """Gather (2,F) slices (x-adjacent corner pairs in dense layout)."""
    idx0 = jax.random.randint(jax.random.PRNGKey(4), (N_EL,), 0, S_BIG,
                              dtype=jnp.int32)
    base = run_scan(lambda idx: idx[:8].astype(jnp.float32), idx0)
    print(f"baseline {base:.2f} ms")
    tab = jnp.ones((S_BIG, 2))
    n = 1 << 20

    def op(idx, t):
        starts = jnp.clip(idx[:n], 0, S_BIG - 2)
        out = jax.vmap(lambda s: jax.lax.dynamic_slice(t, (s, 0), (2, 2)))(
            starts)
        return out
    ms = run_scan(op, idx0, (tab,)) - base
    print(f"  vmap dynamic_slice (2,2) x {n}: {ms:7.2f} ms  "
          f"{ms*1e6/n:5.2f} ns/slice")

    flat = jnp.ones((S_BIG * 2,))

    def op2(idx, t):
        starts = jnp.clip(idx[:n] * 2, 0, S_BIG * 2 - 4)
        out = jax.vmap(lambda s: jax.lax.dynamic_slice(t, (s,), (4,)))(starts)
        return out
    ms = run_scan(op2, idx0, (flat,)) - base
    print(f"  vmap dynamic_slice flat 4 x {n}: {ms:7.2f} ms  "
          f"{ms*1e6/n:5.2f} ns/slice")


def bench_bigtable():
    """Row gather cost from a 256MB table (cache-miss regime)."""
    S = 1 << 25
    idx0 = jax.random.randint(jax.random.PRNGKey(5), (N_EL,), 0, S,
                              dtype=jnp.int32)
    tab = jnp.ones((S, 2))

    @jax.jit
    def f(idx0, t):
        def body(c, j):
            idx = (idx0 + j * 977) % S
            return c + t[idx].ravel()[0], 0
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c
    float(f(idx0, tab))
    t0 = time.perf_counter()
    float(f(idx0 + 1, tab))
    ms = (time.perf_counter() - t0) / K * 1e3
    print(f"  gather rows-of-2 from 2^25-row table, 2M rows: {ms:7.2f} ms "
          f"{ms*1e6/N_EL:5.2f} ns/row")
    # scatter into big table
    v = jnp.ones((N_EL,))

    @jax.jit
    def g(idx0, v):
        def body(c, j):
            idx = (idx0 + j * 977) % S
            out = jnp.zeros((S,), jnp.float32).at[idx].add(v, mode="drop")
            return c + out.ravel()[0], 0
        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return c
    float(g(idx0, v))
    t0 = time.perf_counter()
    float(g(idx0 + 1, v))
    ms = (time.perf_counter() - t0) / K * 1e3
    print(f"  width-1 scatter into 2^25 table, 2M els: {ms:7.2f} ms "
          f"{ms*1e6/N_EL:5.2f} ns/el")


SECTIONS.update(sharded=bench_sharded, slice_gather=bench_slice_gather,
                bigtable=bench_bigtable)


if __name__ == "__main__":
    which = sys.argv[1:] or list(SECTIONS)
    print("device:", jax.devices()[0])
    for name in which:
        SECTIONS[name]()
