"""Does scatter-add cost depend on dtype? (bf16 vs f32 width-1, v5e).

If the XLA TPU scatter loop is byte-bound rather than purely
per-element-bound, a bf16 gradient table (parity precedent: the reference
accumulates grid gradients with fp16 atomics, grid.h kernel backward)
halves the 250 ms hashed-level scatter wall. Methodology per
_bench_primitives2 (lax.scan, varying indices).
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import jax
import jax.numpy as jnp

N_EL = 1 << 21
S_BIG = 1 << 19
K = 16


def run_scan(op, idx0, extras=(), k=K):
    @jax.jit
    def f(idx0, *extras):
        def body(carry, j):
            idx = (idx0 + j * 977) % S_BIG
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


def main():
    idx0 = jax.random.randint(jax.random.PRNGKey(0), (N_EL,), 0, S_BIG,
                              dtype=jnp.int32)
    base = run_scan(lambda idx: idx[:8].astype(jnp.float32), idx0)
    print(f"baseline {base:.2f} ms/iter", flush=True)
    for dt_name in ("float32", "bfloat16", "float16"):
        dt = jnp.dtype(dt_name)
        src = jnp.ones((N_EL,), dt)

        def op(idx, src=src, dt=dt):
            return jnp.zeros((S_BIG,), dt).at[idx].add(src, mode="drop")

        ms = run_scan(op, idx0) - base
        print(f"width-1 scatter-add {dt_name:9s}: {ms:7.2f} ms "
              f"({ms * 1e6 / N_EL:.2f} ns/el)", flush=True)
    # gather comparison too (forward side)
    for dt_name in ("float32", "bfloat16"):
        dt = jnp.dtype(dt_name)
        tbl = jnp.ones((S_BIG, 2), dt)

        def opg(idx, tbl=tbl):
            return tbl[idx].astype(jnp.float32)

        ms = run_scan(opg, idx0) - base
        print(f"rows-of-2 gather    {dt_name:9s}: {ms:7.2f} ms "
              f"({ms * 1e6 / N_EL:.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
