"""IO tests: TUM dataset replay, checkpoints, settings.cfg parsing."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.io import checkpoint, settings, tum
from ptam_cg_tpu.models import map_state, tracker
from ptam_cg_tpu.utils import se3 as se3lib


def test_tum_write_read_roundtrip(tmp_path):
    frames = [np.random.default_rng(i).uniform(0, 255, (24, 32))
              .astype(np.float32) for i in range(5)]
    tum.write_synthetic_dataset(str(tmp_path), frames)
    ds = tum.TumDataset(str(tmp_path))
    assert len(ds) == 5
    np.testing.assert_allclose(ds.frame(2), frames[2])
    # Wraparound (ref: src/VideoSource.cc wrap behavior).
    np.testing.assert_allclose(ds.frame(7), frames[2])
    ts, f0 = ds.next_frame()
    assert ts == 0.0
    np.testing.assert_allclose(f0, frames[0])


def test_tum_skips_comments(tmp_path):
    (tmp_path / "rgb").mkdir()
    np.save(tmp_path / "rgb" / "a.npy", np.zeros((4, 4), np.float32))
    (tmp_path / "rgb.txt").write_text(
        "# comment\n\n1.5 rgb/a.npy\n# another\n")
    ds = tum.TumDataset(str(tmp_path))
    assert len(ds) == 1
    assert ds.entries[0][0] == 1.5


def test_groundtruth_parse(tmp_path):
    (tmp_path / "groundtruth.txt").write_text(
        "# ts tx ty tz qx qy qz qw\n"
        "1.0 0.1 0.2 0.3 0.0 0.0 0.0 1.0\n"
        "2.0 0.2 0.3 0.4 0.1 0.0 0.0 0.99\n")
    ts, pos, quat = tum.load_groundtruth(str(tmp_path))
    assert len(ts) == 2
    np.testing.assert_allclose(pos[0], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(quat[0], [1.0, 0, 0, 0])  # wxyz


def test_checkpoint_roundtrip(tmp_path):
    m = map_state.empty_map((64, 64), max_points=32, max_kfs=2)
    m = m._replace(point_pos=m.point_pos.at[0].set(jnp.array([1., 2., 3.])),
                   point_valid=m.point_valid.at[0].set(True),
                   good=jnp.asarray(True))
    st = tracker.init_tracker_state(
        se3lib.se3_exp(jnp.array([.1, .2, .3, .01, .02, .03])))
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_map(path, m, st, meta={"frame": 42})
    m2, st2 = checkpoint.load_map(path)
    np.testing.assert_allclose(m2.point_pos[0], [1, 2, 3])
    assert bool(m2.good)
    assert bool(m2.point_valid[0])
    np.testing.assert_allclose(st2.pose.R, st.pose.R, atol=1e-7)
    assert os.path.exists(path + ".meta.json")


def test_export_map_text(tmp_path):
    m = map_state.empty_map((64, 64), max_points=8, max_kfs=2)
    m = m._replace(
        point_pos=m.point_pos.at[0].set(jnp.array([1., 2., 3.])),
        point_valid=m.point_valid.at[0].set(True),
        kf_valid=m.kf_valid.at[0].set(True))
    prefix = str(tmp_path) + "/"
    checkpoint.export_map_text(prefix, m)
    dump = open(prefix + "map.dump").read()
    assert "1.0 2.0 3.0" in dump
    assert os.path.exists(prefix + "keyframes/0.info")


def test_settings_parse_reference_format(tmp_path):
    cam_cfg = tmp_path / "camera.cfg"
    cam_cfg.write_text(
        "Camera.Parameters=[ 1.0803 1.43987 0.519983 0.548655 0.244943 ]\n")
    cfg_file = tmp_path / "settings.cfg"
    cfg_file.write_text(
        "// comment line\n"
        "exec camera.cfg\n"
        "VideoSource.Resolution = [ 640 480 ]\n"
        'VideoSource.DataSet = "../data/some_set"\n'
        "Tracker.CoarseMin = 25\n"
        "Tracker.MEstimator = \"Tukey\"\n"
        "MapMaker.CandidateMinShiTomasiScore = 400\n"
        "Reloc2.MaxScore = 9e6\n")
    cfg, gv = settings.load_engine_config(str(cfg_file))
    assert cfg.camera.params == pytest.approx(
        (1.0803, 1.43987, 0.519983, 0.548655, 0.244943))
    assert cfg.camera.image_size == (640, 480)
    assert cfg.tracker.coarse_min == 25
    assert cfg.tracker.mestimator == "tukey"
    assert cfg.mapmaker.candidate_min_shi_tomasi_score == 400
    assert cfg.reloc.max_score == 9e6
    assert gv["VideoSource.DataSet"] == "../data/some_set"


def test_dataset_replay_through_engine_frontend(tmp_path):
    """Dataset frames flow into the frame builder (config-1 harness)."""
    from ptam_cg_tpu.io import synth
    from ptam_cg_tpu.models import keyframe
    seq = synth.SyntheticSequence(
        (1.0803, 1.43987, 0.519983, 0.548655, 0.244943),
        image_size=(64, 64), n_frames=3, seed=0)
    tum.write_synthetic_dataset(str(tmp_path),
                                [seq.frame(i) for i in range(3)])
    ds = tum.TumDataset(str(tmp_path))
    _, frame = ds.next_frame()
    ff = keyframe.build_frame(jnp.asarray(frame),
                              candidate_min_score=50.0)
    assert int(ff.corner_count.sum()) > 0


def test_rolling_shutter_rows_match_interpolated_poses():
    """Row r of a rolling-shutter render must equal row r of a STATIC
    render at that row's exposure-time pose (the per-row pose stack in
    synth._make_rays is exactly row-sequential CMOS readout)."""
    from ptam_cg_tpu.camera import atan
    from ptam_cg_tpu.io import synth

    params = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
    size = (80, 64)
    cam = atan.make_camera(params, size)
    tex = synth.make_texture(jnp.asarray([0, 3], jnp.uint32), 128)
    T0 = se3lib.SE3(jnp.eye(3), jnp.asarray([0.0, 0.0, 1.5]))
    delta = jnp.asarray([0.08, 0.02, 0.0, 0.0, 0.03, 0.0], jnp.float32)
    rs = synth.render_motion(cam, T0, delta, tex, size, None, 64.0,
                             n_blur=0, rolling_shutter=1.0, exposure=0.0)
    H = size[1]
    for r in (0, H // 2, H - 1):
        alpha = jnp.float32((r + 0.5) / H)
        Tr = synth.interp_pose(T0, delta, alpha)
        static = synth.render_plane(cam, Tr, tex, size, 64.0)
        np.testing.assert_allclose(np.asarray(rs[r]),
                                   np.asarray(static[r]), atol=1e-3)


def test_motion_blur_softens_and_is_deterministic():
    from ptam_cg_tpu.io import synth

    params = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
    kw = dict(image_size=(80, 64), n_frames=5, seed=4, radius=0.5,
              sweep=1.5)
    clean = synth.SyntheticSequence(params, **kw)
    blurred = synth.SyntheticSequence(params, motion_blur=6, **kw)
    f0 = np.asarray(clean.frame(1))
    f1 = np.asarray(blurred.frame(1))
    assert np.abs(f0 - f1).mean() > 0.5          # visibly different
    g0 = np.abs(np.diff(f0, axis=1)).mean()      # blur kills gradients
    g1 = np.abs(np.diff(f1, axis=1)).mean()
    assert g1 < g0
    np.testing.assert_array_equal(f1, np.asarray(blurred.frame(1)))
    # Final frame has no successor motion: blur degenerates to clean.
    np.testing.assert_allclose(np.asarray(blurred.frame(4)),
                               np.asarray(clean.frame(4)), atol=1e-3)
