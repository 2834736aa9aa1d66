"""Meshroom plugin: the node definition must carry the reference
plugin's parameter surface (meshroom/RNb-NeuS2/RNbNeuS2.py) and
processChunk must map node attributes onto run_full_pipeline correctly.
Meshroom itself is not in this image, so `meshroom.core` is mocked —
the same treatment as the pyalicevision loader tests."""

import importlib.util
import os
import sys
import types

import pytest


@pytest.fixture()
def node_cls(monkeypatch):
    desc = types.ModuleType("meshroom.core.desc")

    class _Param:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    for n in ("File", "IntParam", "FloatParam", "BoolParam",
              "ChoiceParam"):
        setattr(desc, n, _Param)

    class Level:
        INTENSIVE = "intensive"

    class Node:
        pass

    class DynamicNodeSize:
        def __init__(self, name):
            self.name = name

    desc.Level = Level
    desc.Node = Node
    desc.DynamicNodeSize = DynamicNodeSize

    core = types.ModuleType("meshroom.core")
    core.desc = desc
    utils = types.ModuleType("meshroom.core.utils")
    utils.VERBOSE_LEVEL = ["fatal", "error", "warning", "info", "debug",
                           "trace"]
    meshroom = types.ModuleType("meshroom")
    meshroom.core = core
    monkeypatch.setitem(sys.modules, "meshroom", meshroom)
    monkeypatch.setitem(sys.modules, "meshroom.core", core)
    monkeypatch.setitem(sys.modules, "meshroom.core.desc", desc)
    monkeypatch.setitem(sys.modules, "meshroom.core.utils", utils)

    path = os.path.join(os.path.dirname(__file__), "..", "meshroom",
                        "RNb-NeuS2-TPU", "RNbNeuS2TPU.py")
    spec = importlib.util.spec_from_file_location("rnb_meshroom_node",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.RNbNeuS2TPU


def test_node_parameter_surface_matches_reference(node_cls):
    """Same knobs as the reference plugin, minus the two that do not
    apply (rnbNeuS2Path: the testbed is this package; useGpu → useTpu)."""
    names = {p.name for p in node_cls.inputs}
    reference = {"inputNormalSfm", "inputAlbedoSfm", "inputMaskSfm",
                 "inputMaskFolder", "maxSteps", "meshResolution",
                 "scalingMode", "sphereScale", "warmupRatio",
                 "maskWeight", "superNormal", "useL1", "useRgbPlus",
                 "verboseLevel"}
    assert reference <= names
    assert "useTpu" in names          # replaces useGpu
    out = {p.name for p in node_cls.outputs}
    assert out == {"outputFolder", "outputMesh"}


def test_process_chunk_maps_attributes(node_cls, monkeypatch, tmp_path):
    calls = {}

    def fake_pipeline(**kw):
        calls.update(kw)

    import rnb_neus2_tpu.cli.pipeline as pl
    monkeypatch.setattr(pl, "run_full_pipeline", fake_pipeline)

    class Attr:
        def __init__(self, v):
            self.value = v

    class LogManager:
        def start(self, lvl):
            calls["_log_level"] = lvl

        def end(self):
            calls["_log_ended"] = True

    node = types.SimpleNamespace(
        inputNormalSfm=Attr("/data/normals.sfm"),
        inputAlbedoSfm=Attr("/data/albedos.sfm"),
        inputMaskSfm=Attr(""),
        inputMaskFolder=Attr("/data/masks"),
        maxSteps=Attr(12345),
        meshResolution=Attr(512),
        scalingMode=Attr("silhouettes_v2"),
        sphereScale=Attr(1.1),
        warmupRatio=Attr(0.2),
        maskWeight=Attr(0.7),
        superNormal=Attr(True),
        useL1=Attr(True),
        useRgbPlus=Attr(False),
        useTpu=Attr(True),
        verboseLevel=Attr("info"),
        outputFolder=Attr(str(tmp_path)),
    )
    chunk = types.SimpleNamespace(node=node, logManager=LogManager(),
                                  logger=None)
    node_cls().processChunk(chunk)

    assert calls["input_path"] == "/data/normals.sfm"
    assert calls["output_dir"] == str(tmp_path)
    assert calls["max_steps"] == 12345
    assert calls["mesh_resolution"] == 512
    assert calls["scaling_mode"] == "silhouettes_v2"
    assert calls["has_albedo"] is True        # albedo SfM set
    assert calls["albedo_sfm_path"] == "/data/albedos.sfm"
    assert calls["mask_folder_path"] == "/data/masks"
    assert calls["super_normal"] and calls["use_l1"]
    assert calls["use_rgb_plus"] is False
    assert calls["mask_weight"] == 0.7
    assert calls["_log_level"] == "info" and calls["_log_ended"]
