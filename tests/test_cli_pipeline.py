"""CLI + pipeline end-to-end smoke: prepared scene dir → two-stage training
with snapshot resume → mesh on disk → postprocess. Exercises the REAL file
formats (16-bit RGBA PNGs through the decode path, transform.json,
msgpack snapshot, OBJ output)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rnb_neus2_tpu.cli import pipeline, testbed
from rnb_neus2_tpu.mesh.writer import load_obj
from rnb_neus2_tpu.testing.synthetic import write_prepared_scene

pytestmark = pytest.mark.slow  # two-stage e2e training

# --n-chips 1: keep CLI e2e tests on the single-chip Trainer — the
# conftest's 8-device virtual CPU mesh would trigger the CLI's
# data-parallel auto-selection, 8 shard_map programs on one physical
# core (ParallelTrainer has its own dedicated tests in test_parallel.py)
SMALL = ["--target-batch-size", "8192", "--occ-grid-size", "32",
         "--n-ladder", "512", "--n-chips", "1"]
RADIUS = 0.2


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    write_prepared_scene(str(root), n_views=8, width=32, height=32,
                         radius=RADIUS)
    return str(root)


def test_png_decode_path_matches_builder(scene):
    """Loading the PNG scene must reproduce the in-memory fixture decode."""
    from rnb_neus2_tpu.io.dataset import load_transform_json
    from rnb_neus2_tpu.testing.synthetic import sphere_dataset

    ds_png = load_transform_json(scene)
    ds_mem = sphere_dataset(n_views=8, width=32, height=32, radius=RADIUS)
    np.testing.assert_allclose(np.asarray(ds_png.cameras.origin),
                               np.asarray(ds_mem.cameras.origin), atol=1e-5)
    n_png = np.asarray(ds_png.normals)
    n_mem = np.asarray(ds_mem.normals)
    inside = np.asarray(ds_mem.alpha_normal) > 0.5
    # PNG quantization: 16-bit → ~1e-4 per channel
    assert np.abs(n_png[inside] - n_mem[inside]).max() < 5e-3
    np.testing.assert_array_equal(np.asarray(ds_png.alpha_normal) > 0.5,
                                  inside)


def test_two_stage_pipeline_end_to_end(scene):
    pipeline.run_two_stage(scene, max_steps=360, common_flags=SMALL,
                           resolution=48, no_albedo=True)
    out = os.path.join(scene, "output")
    assert os.path.exists(os.path.join(out, "snapshot_240.msgpack"))
    assert os.path.exists(os.path.join(out, "snapshot_360.msgpack"))
    mesh_path = os.path.join(out, "mesh_360.obj")
    assert os.path.exists(mesh_path)
    V, F = load_obj(mesh_path)
    assert len(V) > 100 and len(F) > 100
    # mechanics test, not convergence (test_train_e2e covers that): the
    # surface must have GROWN from the geometric-init radius (world 0.186)
    # toward the target (world 0.4) and stay a plausible closed blob
    r = np.linalg.norm(V, axis=1)
    assert 0.19 < float(np.median(r)) < 0.45
    assert float(np.std(r)) < 0.1

    final = os.path.join(scene, "mesh.obj")
    pipeline.postprocess_mesh(scene, final)
    assert os.path.exists(final)
    V2, _ = load_obj(final)
    assert len(V2) > 50


def test_two_stage_resume_from_rolling_snapshot(tmp_path):
    """Outage recovery: a run killed mid-stage-1 leaves the rolling
    --snapshot-each checkpoint; run_two_stage(resume=True) continues from
    it (not from scratch), finishes both stages, and a second resume call
    is a no-op skip."""
    scene = str(tmp_path / "scene")
    write_prepared_scene(scene, n_views=8, width=32, height=32,
                         radius=RADIUS)
    out = os.path.join(scene, "output")

    # simulate a stage-1 run that died at step ~120 of 240: the testbed
    # got through one --snapshot-each boundary before the transport
    # dropped (boundary == maxiter writes no rolling snapshot, so train
    # one step past it)
    rc = testbed.main(["--scene", scene, "--maxiter", "121", "--no-gui",
                       "--snapshot-each", "120"] + SMALL)
    assert rc == 0
    latest = os.path.join(out, "snapshot_latest.msgpack")
    assert os.path.exists(latest)
    path, step = pipeline._latest_snapshot_step(out)
    assert step == 120

    pipeline.run_two_stage(scene, max_steps=360, common_flags=SMALL,
                           resolution=48, no_albedo=True, resume=True)
    assert os.path.exists(os.path.join(out, "snapshot_240.msgpack"))
    assert os.path.exists(os.path.join(out, "mesh_360.obj"))

    # fully complete → resume is an instant double-skip (no training, no
    # new mesh extraction): mesh mtime unchanged
    mesh = os.path.join(out, "mesh_360.obj")
    mtime = os.path.getmtime(mesh)
    pipeline.run_two_stage(scene, max_steps=360, common_flags=SMALL,
                           resolution=48, no_albedo=True, resume=True)
    assert os.path.getmtime(mesh) == mtime


def test_rolling_snapshot_keeps_one_generation_back(tmp_path):
    """--snapshot-each rotates latest → latest.prev on every write, and
    _latest_snapshot_step falls back to .prev when the newest file is
    unreadable (truncated write, or a window skipped by the divergence
    guard)."""
    scene = str(tmp_path / "scene")
    write_prepared_scene(scene, n_views=8, width=32, height=32,
                         radius=RADIUS)
    out = os.path.join(scene, "output")
    rc = testbed.main(["--scene", scene, "--maxiter", "121", "--no-gui",
                       "--snapshot-each", "60"] + SMALL)
    assert rc == 0
    latest = os.path.join(out, "snapshot_latest.msgpack")
    prev = latest + ".prev"
    assert os.path.exists(latest) and os.path.exists(prev)
    assert pipeline._latest_snapshot_step(out)[1] == 120
    with open(latest, "wb") as f:
        f.write(b"truncated")
    path2, step2 = pipeline._latest_snapshot_step(out)
    assert path2 == prev and step2 == 60
    os.remove(latest), os.remove(prev)
    assert pipeline._latest_snapshot_step(out) == (None, -1)


def test_trace_steps_writes_device_trace(tmp_path):
    """--trace-steps wraps a mid-run window in jax.profiler.trace (the
    headless analog of the reference GUI's profiling panels) and the
    run still reaches maxiter."""
    import glob

    scene = str(tmp_path / "scene")
    write_prepared_scene(scene, n_views=4, width=24, height=24)
    rc = testbed.main(["--scene", scene, "--maxiter", "20", "--no-gui",
                       "--trace-steps", "4", "--target-batch-size",
                       "2048", "--occ-grid-size", "16", "--n-ladder",
                       "128", "--n-chips", "1"])
    assert rc == 0
    files = [f for f in glob.glob(scene + "/output/trace/**/*",
                                  recursive=True) if os.path.isfile(f)]
    assert files, "no trace artifacts written"


def test_testbed_cli_flags_parse():
    p = testbed.build_argparser()
    args = p.parse_args(["--scene", "/tmp/x", "--maxiter", "100",
                         "--no-gui", "--lone", "--supernormal",
                         "--opti-lights", "--mask-weight", "0.5",
                         "--snapshot", "snap.msgpack", "--save-mesh",
                         "--resolution", "256", "--fractional-training",
                         "50", "--bce", "--relu", "--no-rgbplus",
                         "--no-albedo", "--save-each", "10",
                         "--free-memory", "--disable-snap-to-center"])
    cfg = testbed.make_config(args)
    assert not cfg.flags.apply_l2          # --lone
    assert not cfg.flags.apply_rgbplus
    assert cfg.flags.apply_supernormal and cfg.flags.apply_light_opti
    assert cfg.flags.apply_bce and cfg.flags.apply_relu
    assert cfg.flags.apply_no_albedo
    assert cfg.loss.mask_loss_weight == 0.5
    assert cfg.train.fractional_from_step == 50
    assert cfg.train.max_steps == 100
