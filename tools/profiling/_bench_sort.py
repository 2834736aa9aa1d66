"""Re-test sort-based scatter routes on the real chip.

Round-2 note said lax.sort_key_val on 2M keys did not finish in 300 s —
suspicious (TPU sorts are normally ms-scale); if that was an axon-runtime
pathology, a sort+segment-sum scatter could undercut the 6.7 ns/el width-1
scatter floor for the hashed-level backward:

  scatter-add of M elements into T rows
  = sort M (index,value) pairs by index + segment-sum + one dense add.

Methodology: lax.scan of 16 varying iterations inside one jit (the only
thing that survives the runtime's memoization), like _bench_primitives2.
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        (r[0] if isinstance(r, tuple) else r).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    M = 2 << 20            # 2M source elements
    T = 1 << 19            # table rows
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
    val = jax.random.normal(jax.random.PRNGKey(1), (M,), jnp.float32)

    @jax.jit
    def scan_sort(idx, val):
        def body(c, _):
            i, v = c
            i2 = (i * 1664525 + 1013904223) & (T - 1)
            si, sv = jax.lax.sort_key_val(i2, v)
            return (si, sv), sv[0]
        (si, sv), _ = jax.lax.scan(body, (idx, val), None, length=16)
        return si, sv

    @jax.jit
    def scan_sort_only(idx):
        def body(i, _):
            i2 = (i * 1664525 + 1013904223) & (T - 1)
            return jnp.sort(i2), i2[0]
        i, _ = jax.lax.scan(body, idx, None, length=16)
        return i

    @jax.jit
    def scan_scatter(idx, val):
        def body(c, _):
            i, v = c
            i2 = (i * 1664525 + 1013904223) & (T - 1)
            tab = jnp.zeros((T,), jnp.float32).at[i2].add(v)
            return (i2, v + tab[0]), tab[0]
        (i, v), _ = jax.lax.scan(body, (idx, val), None, length=16)
        return i, v

    @jax.jit
    def scan_seg(idx, val):
        # sort + segment_sum via sorted-order ones trick
        def body(c, _):
            i, v = c
            i2 = (i * 1664525 + 1013904223) & (T - 1)
            si, sv = jax.lax.sort_key_val(i2, v)
            tab = jax.ops.segment_sum(sv, si, num_segments=T,
                                      indices_are_sorted=True)
            return (si, sv + tab[0]), tab[0]
        (i, v), _ = jax.lax.scan(body, (idx, val), None, length=16)
        return i, v

    for name, fn, args in [
        ("width1-scatter (baseline)", scan_scatter, (idx, val)),
        ("sort only (jnp.sort)", scan_sort_only, (idx,)),
        ("sort_key_val", scan_sort, (idx, val)),
        ("sort+segsum(sorted)", scan_seg, (idx, val)),
    ]:
        try:
            t = timeit(fn, *args)
            per = t / 16 / M * 1e9
            print(f"{name}: {t*1e3/16:.2f} ms/iter = {per:.2f} ns/el",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
