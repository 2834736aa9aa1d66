"""Time mesh extraction on the real TPU: device backend vs host backend.

VERDICT round-1 target: 512³ extraction < 30 s (the host-MC path alone
costs ~270 s of 1-core numpy at 512³ — marching_device.py moves the
triangulation into HBM). Run twice to see the warm-cache number (the
persistent compilation cache absorbs the first-run compiles).

Usage (tunnel up): python tools/profiling/_mc_bench_device.py [res ...]
"""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import time

import jax


def main():
    from rnb_neus2_tpu.config import HashGridConfig, NetworkConfig
    from rnb_neus2_tpu.mesh.extract import extract_mesh
    from rnb_neus2_tpu.models.neus_field import NeusField, init_params
    from rnb_neus2_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    grid, net = HashGridConfig(), NetworkConfig()
    field = NeusField(grid, net)
    params = init_params(jax.random.PRNGKey(0), grid, net)
    # geometric init ⇒ the SDF is already a clean sphere: representative
    # block-culling behavior without a training run

    for res in [int(a) for a in sys.argv[1:]] or [512, 512, 256]:
        for backend in ("device", "host"):
            t0 = time.time()
            m = extract_mesh(field, params, resolution=res,
                             backend=backend)
            dt = time.time() - t0
            print(f"res {res} backend {backend}: {dt:.1f} s  "
                  f"V={len(m['V'])} F={len(m['F'])}", flush=True)


if __name__ == "__main__":
    main()
