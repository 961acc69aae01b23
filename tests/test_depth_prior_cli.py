"""--weights-dir depth-prior plumbing (VERDICT r4 #6): the MiDaS/DPT
checkpoint in the weights dir must reach train_map as a depth_estimator
through the run_scene CLI, and short --iterations runs must scale the
pseudo-view sampling window so the prior actually fires."""

import argparse
import os

import numpy as np
import pytest

import gs_localization_tpu.pipelines as pipelines_pkg
from gs_localization_tpu.pipelines import run_scene
from gs_localization_tpu.sfm import weights as weights_lib


def _args(**kw):
    ns = argparse.Namespace(
        weights_dir=None, scene="/nonexistent", out="/tmp/x",
        preset="seven_scenes", iterations=None, max_pairs=1 << 15,
        max_per_tile=256, stream=False, model_dir="sparse_dslam/0",
        images_dir="images_full", use_depth=True)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_no_weights_dir_gives_none():
    assert run_scene._build_depth_estimator(_args()) is None


def test_empty_weights_dir_gives_none(tmp_path):
    assert run_scene._build_depth_estimator(
        _args(weights_dir=str(tmp_path))) is None


def test_dpt_checkpoint_enables_estimator(tmp_path, monkeypatch):
    f = tmp_path / weights_lib.MANIFEST["dpt_hybrid"].file
    f.write_bytes(b"stub")
    sentinel_params = {"p": 1}
    monkeypatch.setattr(weights_lib, "load",
                        lambda name, path: sentinel_params)

    def stub_maker(params):
        assert params is sentinel_params
        return lambda rgb: np.full(rgb.shape[:2], 2.0, np.float32)

    import gs_localization_tpu.ops.dpt as dpt_mod
    monkeypatch.setattr(dpt_mod, "make_dpt_estimator", stub_maker)
    est = run_scene._build_depth_estimator(_args(weights_dir=str(tmp_path)))
    assert est is not None
    out = est(np.zeros((8, 6, 3), np.float32))
    assert out.shape == (8, 6) and float(out[0, 0]) == 2.0


def test_midas_fallback_when_no_dpt(tmp_path, monkeypatch):
    f = tmp_path / weights_lib.MANIFEST["midas_v21"].file
    f.write_bytes(b"stub")
    monkeypatch.setattr(weights_lib, "load", lambda name, path: {"m": 1})
    import gs_localization_tpu.ops.midas as midas_mod
    monkeypatch.setattr(
        midas_mod, "make_midas_estimator",
        lambda params: (lambda rgb: np.zeros(rgb.shape[:2], np.float32)))
    est = run_scene._build_depth_estimator(_args(weights_dir=str(tmp_path)))
    assert est is not None


def test_stage_train_threads_estimator_and_scales_schedule(
        tmp_path, monkeypatch):
    """stage_train must pass the estimator to train_map and rescale the
    (2k, 29k) pseudo-view window for short runs."""
    f = tmp_path / weights_lib.MANIFEST["dpt_hybrid"].file
    f.write_bytes(b"stub")
    monkeypatch.setattr(weights_lib, "load", lambda name, path: {})
    import gs_localization_tpu.ops.dpt as dpt_mod
    stub = lambda rgb: np.full(rgb.shape[:2], 3.0, np.float32)  # noqa: E731
    monkeypatch.setattr(dpt_mod, "make_dpt_estimator", lambda p: stub)

    class FakeScene:
        points = np.zeros((0, 3), np.float32)
        colors = np.zeros((0, 3), np.float32)
        extent = 1.0

    monkeypatch.setattr(run_scene, "_load_scene", lambda args: FakeScene())
    captured = {}

    def fake_train_map(scene, out, tcfg, mcfg, rcfg, depth_estimator=None):
        captured["est"] = depth_estimator
        captured["tcfg"] = tcfg

    monkeypatch.setattr(pipelines_pkg, "train_map", fake_train_map)
    run_scene.stage_train(_args(weights_dir=str(tmp_path), iterations=300))
    assert captured["est"] is stub
    tcfg = captured["tcfg"]
    assert tcfg.start_sample_pseudo == int(2_000 * 300 / 30_000)
    assert tcfg.end_sample_pseudo == int(29_000 * 300 / 30_000)
    assert tcfg.start_sample_pseudo < 300 < 2_000
