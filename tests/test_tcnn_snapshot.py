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
        march=MarchConfig(n_ladder=64))
    ds = sphere_dataset(n_views=3, width=16, height=16, radius=0.25)
    tr = Trainer(ds, cfg)
    for _ in range(3):
        tr.train_step()
    return tr


def test_blob_size_matches_reference_formula(trainer):
    shapes = tsnap.MlpShapes.from_config(trainer.cfg)
    # full config: 64x32 (sdf in = next_mult(31,16)) + 16x64
    # + 64x48 + 64x64 + 16x64 (rgb) + T*2 (hash) + 4 (variance buffer)
    w, t = 64, trainer.cfg.grid.n_table_entries
    expect = w * 32 + 16 * w + w * 48 + w * w + 16 * w + t * 2 + 4
    assert shapes.n_params() == expect
    blob = tsnap.params_to_tcnn_blob(trainer.params, shapes)
    assert blob.dtype == np.float16 and blob.size == expect


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
