"""CUDA-testbed msgpack snapshot interop: layout + round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import msgpack
import pytest

from rnb_neus2_tpu.config import (HashGridConfig, MarchConfig, TestbedConfig,
                                  TrainConfig)
from rnb_neus2_tpu.testing.synthetic import sphere_dataset
from rnb_neus2_tpu.train import tcnn_snapshot as tsnap
from rnb_neus2_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def trainer():
    cfg = TestbedConfig(
        train=TrainConfig(target_batch_size=1 << 10,
                          initial_rays_per_batch=64, occ_grid_size=16),
        march=MarchConfig(n_ladder=64, cone_angle=1.0 / 256.0))
    ds = sphere_dataset(n_views=3, width=16, height=16, radius=0.25)
    tr = Trainer(ds, cfg)
    for _ in range(3):
        tr.train_step()
    return tr


@pytest.mark.slow  # full-size trainer fixture
def test_blob_size_matches_reference_formula(trainer):
    shapes = tsnap.MlpShapes.from_config(trainer.cfg)
    # full config: 64x32 (sdf in = next_mult(31,16)) + 16x64
    # + 64x48 + 64x64 + 16x64 (rgb) + T*2 (hash) + 4 (variance buffer)
    w, t = 64, trainer.cfg.grid.n_table_entries
    expect = w * 32 + 16 * w + w * 48 + w * w + 16 * w + t * 2 + 4
    assert shapes.n_params() == expect
    blob = tsnap.params_to_tcnn_blob(trainer.params, shapes)
    assert blob.dtype == np.float16 and blob.size == expect


@pytest.mark.slow  # full-size trainer fixture
def test_params_roundtrip_through_tcnn_layout(trainer):
    shapes = tsnap.MlpShapes.from_config(trainer.cfg)
    blob = tsnap.params_to_tcnn_blob(trainer.params, shapes)
    back = tsnap.tcnn_blob_to_params(blob, shapes, trainer.params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(trainer.params),
            jax.tree_util.tree_leaves_with_path(back)):
        assert a.shape == b.shape, (pa, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3, err_msg=str(pa))


@pytest.mark.slow  # full-size trainer fixture
def test_snapshot_file_roundtrip(trainer, tmp_path):
    path = str(tmp_path / "snap.msgpack")
    tsnap.export_cuda_snapshot(path, trainer, {"encoding": {"otype": "HashGrid"}})

    # the file is plain msgpack with the reference's keys
    with open(path, "rb") as f:
        raw = msgpack.unpackb(f.read(), raw=False)
    assert "snapshot" in raw and "params_binary" in raw["snapshot"]
    assert raw["snapshot"]["n_params"] * 2 == len(
        raw["snapshot"]["params_binary"])
    assert raw["encoding"]["otype"] == "HashGrid"

    # import into a fresh trainer: EMA params match the exported ones
    cfg = trainer.cfg
    ds = sphere_dataset(n_views=3, width=16, height=16, radius=0.25)
    tr2 = Trainer(ds, cfg)
    snap = tsnap.import_cuda_snapshot(path, tr2)
    assert tr2.step == trainer.step
    src = trainer.opt_state.ema_params
    for a, b in zip(jax.tree_util.tree_leaves(src),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
    # density grid travelled as fp16
    np.testing.assert_allclose(np.asarray(tr2.occ.density),
                               np.asarray(trainer.occ.density),
                               atol=1e-2, rtol=1e-2)
    assert snap["training_step"] == trainer.step


@pytest.mark.slow  # full-size trainer fixture
def test_import_rejects_mismatched_config(trainer, tmp_path):
    path = str(tmp_path / "snap.msgpack")
    tsnap.export_cuda_snapshot(path, trainer)
    cfg2 = TestbedConfig(
        grid=HashGridConfig(n_levels=4, top_resolution=64),
        train=TrainConfig(target_batch_size=1 << 10,
                          initial_rays_per_batch=64, occ_grid_size=16))
    ds = sphere_dataset(n_views=3, width=16, height=16, radius=0.25)
    tr2 = Trainer(ds, cfg2)
    with pytest.raises(ValueError, match="configs differ"):
        tsnap.import_cuda_snapshot(path, tr2)


def test_morton_permutation_roundtrip():
    """Export permutes row-major → Morton; import inverts it exactly."""
    from rnb_neus2_tpu.train.tcnn_snapshot import _morton_to_rowmajor_perm
    g = 8
    perm = _morton_to_rowmajor_perm(g)
    assert sorted(perm) == list(range(g ** 3))
    # morton code of (x,y,z)=(1,0,0) is 1 → row-major 1
    assert perm[1] == 1
    # morton code of (0,1,0) is 2 → row-major g
    assert perm[2] == g
    # morton code of (0,0,1) is 4 → row-major g*g
    assert perm[4] == g * g
    # (7,7,7) = last morton code → last row-major index
    assert perm[g ** 3 - 1] == g ** 3 - 1


@pytest.mark.slow  # full-size trainer fixture
def test_snapshot_density_grid_morton_layout(trainer, tmp_path):
    """density_grid_binary bytes are Morton-ordered (CUDA layout) and
    import restores the row-major grid bit-exactly."""
    import msgpack
    from rnb_neus2_tpu.train import tcnn_snapshot as ts
    g = round(len(trainer.occ.density) ** (1 / 3))
    dens = np.arange(g ** 3, dtype=np.float32) % 97
    trainer.occ = trainer.occ._replace(density=jnp.asarray(dens))
    path = tmp_path / "snap.msgpack"
    ts.export_cuda_snapshot(str(path), trainer)
    with open(path, "rb") as f:
        snap = msgpack.unpackb(f.read(), raw=False)["snapshot"]
    blob = np.frombuffer(snap["density_grid_binary"], np.float16)
    perm = ts._morton_to_rowmajor_perm(g)
    np.testing.assert_array_equal(blob, dens.astype(np.float16)[perm])
    # movement keys present with identity contents
    rot = np.frombuffer(snap["rotation"], np.float16)
    assert rot.size == 12 and rot[0] == 1 and rot[4] == 1 and rot[8] == 1
    loc = np.frombuffer(snap["local_rotation"], np.float16)
    assert loc.size == 8 and loc[0] == 1 and loc[4] == 1
    assert np.frombuffer(snap["transition"], np.float16).size == 4
    assert np.frombuffer(snap["local_transition"], np.float16).size == 4
    # round-trip
    ts.import_cuda_snapshot(str(path), trainer)
    got = np.asarray(trainer.occ.density)
    np.testing.assert_allclose(got, dens.astype(np.float16).astype(
        np.float32))
