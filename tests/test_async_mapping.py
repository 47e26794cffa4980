"""Async mapping thread: tracking works against published snapshots while
mapping jobs run concurrently (the reference's two-thread model,
ref: include/MapMaker.h:37-38, without the documented races)."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.config import CameraConfig, EngineConfig, MapMakerConfig
from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import engine as engine_lib

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (320, 240)


@pytest.mark.slow
def test_async_mapping_tracks_and_grows():
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=26, seed=5, height=1.5,
                                  radius=0.35, sweep=1.3)
    cfg = EngineConfig(
        camera=CameraConfig(params=REF_PARAMS, image_size=SIZE),
        mapmaker=MapMakerConfig(candidate_min_shi_tomasi_score=70.0))
    eng = engine_lib.SLAMEngine(cfg, image_size=SIZE, max_points=1024,
                                max_kfs=8, auto_init_frames=6, seed=0,
                                async_mapping=True)
    try:
        infos = [eng.process_frame(seq.frame(i)) for i in range(26)]
        # Give the worker a moment to drain pending jobs.
        deadline = time.time() + 20.0
        while time.time() < deadline and eng.mapmaker.kf_queue:
            time.sleep(0.2)
        tracking = [inf for inf in infos if inf.stage == "TRACKING"]
        assert len(tracking) > 10
        good = sum(1 for inf in tracking if inf.quality == 2)
        assert good / len(tracking) > 0.8
        # Map grew beyond the stereo-init points via the worker thread.
        assert int(eng.map.n_points()) > 100
        assert int(eng.map.n_kfs()) >= 2
    finally:
        eng.close()
