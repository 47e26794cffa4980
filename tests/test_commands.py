"""Runtime command console (ref: GUI.ParseLine command registry +
live GVars tweaks, src/GLWindow2.cc:15-323, src/main.cc:21-23)."""

import numpy as np
import pytest

from ptam_cg_tpu.config import CameraConfig, EngineConfig, MapMakerConfig
from ptam_cg_tpu.io import commands as cmdlib
from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import engine as engine_lib

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (160, 120)


def make_engine():
    cfg = EngineConfig(
        camera=CameraConfig(params=REF_PARAMS, image_size=SIZE),
        mapmaker=MapMakerConfig(candidate_min_shi_tomasi_score=70.0))
    return engine_lib.SLAMEngine(cfg, image_size=SIZE, max_points=256,
                                 max_kfs=4, auto_init_frames=None)


def test_tunable_assignment_and_get():
    eng = make_engine()
    con = cmdlib.CommandConsole(eng)
    assert con.execute("Engine.DecisionInterval=4") \
        == "Engine.DecisionInterval=4"
    assert eng.decision_interval == 4
    con.execute("Tracker.MinFramesBetweenKFs=7")
    assert eng.cfg.tracker.min_frames_between_kfs == 7
    con.execute("Bundle.MaxIterations=9")
    assert eng.mapmaker.ba_cfg.max_iterations == 9
    assert con.execute("Get Bundle.MaxIterations") \
        == "Bundle.MaxIterations=9"


def test_unknown_tunable_rejected():
    """Unlike GVars (which sets variables nothing reads), compile-baked
    tunables must be rejected loudly."""
    con = cmdlib.CommandConsole(make_engine())
    with pytest.raises(cmdlib.CommandError, match="compile-baked"):
        con.execute("Tracker.RotationEstimatorBlur=1.5")


def test_verbs_reset_poke_info():
    eng = make_engine()
    con = cmdlib.CommandConsole(eng)
    assert "init requested" in con.execute("PokeTracker")
    assert eng._init_requested
    assert "stage=NOT_STARTED" in con.execute("ShowInfo")
    assert "reset" in con.execute("Reset")
    assert "no-op" in con.execute("DrawMap")
    with pytest.raises(cmdlib.CommandError):
        con.execute("FlyToTheMoon")


def test_save_map_verb(tmp_path):
    eng = make_engine()
    con = cmdlib.CommandConsole(eng)
    path = str(tmp_path / "m.npz")
    assert path in con.execute(f"SaveMap {path}")
    from ptam_cg_tpu.io import checkpoint
    m, trk = checkpoint.load_map(path)
    assert m.point_pos.shape == eng.map.point_pos.shape


def test_scripted_console_drives_run(tmp_path):
    """A command file changes live behavior mid-run, like the
    reference's settings.cfg GUI.ParseLine lines."""
    script = tmp_path / "cmds.txt"
    script.write_text(
        "Engine.DecisionInterval=2   // comment\n"
        "@3 Tracker.MinFramesBetweenKFs=9\n"
        "@5 ShowInfo\n")
    eng = make_engine()
    sc = cmdlib.ScriptedConsole(
        eng, cmdlib.load_command_script(str(script)))
    ran = []
    for i in range(8):
        ran += sc.on_frame(i)
    assert eng.decision_interval == 2
    assert eng.cfg.tracker.min_frames_between_kfs == 9
    assert any("stage=" in r for r in ran)
    assert len(ran) == 3
