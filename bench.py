"""Benchmark: per-chip tracking throughput on real hardware.

Prints ONE JSON line: the raw tracking headline
{"metric", "value", "unit", "vs_baseline"} plus stall annotation and —
unless --no-engine — the engine-level numbers (SLAMEngine with mapping
active, via bench_engine.run_engine_bench) under "engine", so the
driver's BENCH_rNN.json captures both (VERDICT r3 #4).

Scenario (the reference's operating point): 640x480 frames, a ~2000-point
map, full per-frame pipeline = frame build (pyramid + FAST + SBI) +
two-stage coarse/fine tracking with up to 1000 fine patches + GN pose
solve (ref envelope: video-rate = 30 FPS on a Core 2 Duo,
doc/PTAM.txt:33-53; BASELINE target >= 5x per chip).
"""

import json
import sys
import time
import traceback

import numpy as np

from bench_common import STALL_THRESHOLD_S, read_rtt_s, sync_read


def main():
    import jax
    import jax.numpy as jnp

    from ptam_cg_tpu.camera import atan
    from ptam_cg_tpu.config import EngineConfig, FrontendConfig
    from ptam_cg_tpu.io import synth
    from ptam_cg_tpu.models import keyframe, map_state, tracker
    from ptam_cg_tpu.ops import levels as levelops
    from ptam_cg_tpu.utils import se3 as se3lib

    bf16 = "--bf16" in sys.argv
    bf16_cross = "--bf16-cross" in sys.argv
    # The FUSED build+track program is the engine's actual TRACKING-stage
    # dispatch since round 3 (and measures faster: 280.0 vs 274.5 FPS);
    # fused is the DEFAULT — "--fused" is accepted as an explicit no-op
    # alias (ADVICE r3), "--split" measures the round-1/2 two-program
    # pipeline instead.
    fused = "--split" not in sys.argv
    if "--fused" in sys.argv and "--split" in sys.argv:
        raise SystemExit("pass at most one of --fused / --split")
    # Round 5: the engine passes a slim 14-leaf TrackView instead of the
    # ~36-leaf MapState (host dispatch cost scales with pytree leaf
    # count on the networked backend — VERDICT r4 #5). The bench
    # measures the same program; --fullmap keeps the old full-MapState
    # argument for A/B.
    fullmap = "--fullmap" in sys.argv
    size = (640, 480)
    params = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
    seq = synth.SyntheticSequence(params, image_size=size, n_frames=8,
                                  seed=7, height=1.5, radius=0.2,
                                  sweep=0.6)
    cam = seq.cam

    # Ground-truth map from frame-0 candidates on the plane (~2000 pts).
    f0 = seq.frame(0)
    fe_cfg = FrontendConfig(atlas_bf16=bf16)
    ff0 = jax.jit(lambda x: keyframe.build_frame(
        x, fe_cfg, candidate_min_score=50.0))(f0)
    pose0 = seq.pose(0)
    T_wc = se3lib.inv(pose0)

    P = 2048
    m = map_state.empty_map(size, max_points=P, max_kfs=4,
                            atlas_dtype=jnp.bfloat16 if bf16
                            else jnp.float32)
    m = map_state.insert_keyframe(m, 0, ff0, pose0, 1.5, 0.1)

    cand_xy = np.asarray(ff0.cand_xy)
    cand_valid = np.asarray(ff0.cand_valid)
    pts, centers, lvls = [], [], []
    for lev in range(4):
        xy = cand_xy[lev][cand_valid[lev]]
        for (x, y) in xy:
            p0 = (np.array([x, y], np.float64) + 0.5) * (1 << lev) - 0.5
            z1 = np.asarray(atan.unproject(
                jnp.asarray(p0, jnp.float32), cam))
            ray = np.asarray(T_wc.R) @ np.array([z1[0], z1[1], 1.0])
            origin = np.asarray(T_wc.t)
            s = -origin[2] / ray[2]
            if s <= 0:
                continue
            pts.append(origin + s * ray)
            centers.append([x, y])
            lvls.append(lev)
            if len(pts) >= P:
                break
        if len(pts) >= P:
            break
    n = len(pts)
    pos = np.zeros((P, 3), np.float32)
    pos[:n] = np.stack(pts)
    ctr = np.zeros((P, 2), np.float32)
    ctr[:n] = np.stack(centers)
    lv = np.zeros(P, np.int32)
    lv[:n] = np.array(lvls)
    c_nc, r_nc, d_nc, nrm = map_state.make_point_rays(
        jnp.asarray(ctr), jnp.asarray(lv), pose0, cam, size)
    m = m._replace(
        point_pos=jnp.asarray(pos),
        point_valid=jnp.asarray(np.arange(P) < n),
        point_src_level=jnp.asarray(lv), point_center=jnp.asarray(ctr),
        point_center_nc=c_nc, point_right_nc=r_nc, point_down_nc=d_nc,
        point_normal_nc=nrm, good=jnp.asarray(True))
    m = map_state.refresh_pixel_vectors(m)

    cfg = EngineConfig(frontend=fe_cfg)
    if bf16_cross:
        from ptam_cg_tpu.config import TrackerConfig
        cfg = cfg.replace(tracker=TrackerConfig(zmssd_bf16_cross=True))
    cam_params = jnp.asarray(params, jnp.float32)

    # The map rides as a device-resident ARGUMENT in both variants
    # (captured multi-MB closure constants slow calls ~3x on this
    # backend). Tracking frames use the lite build (keyframe-only stages
    # skipped, matching the reference's per-frame MakeKeyFrame_Lite).
    build_step = jax.jit(
        lambda im: keyframe.build_frame_tracking(im, cfg.frontend))
    track_step = jax.jit(
        lambda s, m_, ff, ps: tracker.track_frame(
            s, m_, ff, ps, cam, size, cam_params, None, cfg.tracker))
    # ONE dispatch per frame (build + track in one program) — the
    # engine's production TRACKING-stage program. Round-1 measured the
    # fused program slower; the gather rewrites + smaller fine window
    # inverted that (round 3).
    fused_step = jax.jit(
        lambda s, m_, im, ps: tracker.track_frame_from_image(
            s, m_, im, ps, cam, size, cam_params, cfg.tracker,
            cfg.frontend))

    state = tracker.init_tracker_state(pose0)
    frames = [seq.frame(i) for i in range(1, 8)]
    prev_sbi = ff0.sbi_track
    if not fullmap:
        m = tracker.make_track_view(m)

    # Warmup / compile. Two rounds: the second call's state comes from
    # the first call's OUTPUT, whose (non-weak) dtypes differ from the
    # hand-built init state — without this the timed loop hides a
    # recompile.
    if fused:
        outw = fused_step(state, m, frames[0], prev_sbi)
        outw2 = fused_step(outw.state, m, frames[0], outw.sbi_track)
    else:
        ffw = build_step(frames[0])
        outw = track_step(state, m, ffw, prev_sbi)
        outw2 = track_step(outw.state, m, ffw, ffw.sbi_track)
    nf = jnp.sum(outw2.result.meas_valid)
    nf.block_until_ready()
    n_found = int(nf)
    state = outw.state

    # Timed steady-state loop. Per-iteration DISPATCH times are recorded
    # (no per-call blocking — that would serialize the pipeline and
    # measure latency, not throughput); a backend stall surfaces as one
    # dispatch blocking on the full host queue, so thresholding the
    # per-iter times catches it (VERDICT r3 #4).
    iters = 60
    rtt = read_rtt_s()
    st = state
    sbi = prev_sbi
    iter_t = []
    t0 = time.perf_counter()
    if fused:
        for i in range(iters):
            t1 = time.perf_counter()
            out = fused_step(st, m, frames[i % len(frames)], sbi)
            st = out.state
            sbi = out.sbi_track
            iter_t.append(time.perf_counter() - t1)
    else:
        for i in range(iters):
            t1 = time.perf_counter()
            ff = build_step(frames[i % len(frames)])
            out = track_step(st, m, ff, sbi)
            st = out.state
            sbi = ff.sbi_track
            iter_t.append(time.perf_counter() - t1)
    # End the window with a real HOST READ: block_until_ready can return
    # before execution completes on this backend (bench_common.sync_read
    # — round-5 finding); the known read RTT is subtracted.
    sync_read(st.pose.t)
    total = time.perf_counter() - t0 - rtt
    iter_t = np.asarray(iter_t)
    stalls = int((iter_t > STALL_THRESHOLD_S).sum())
    stall_s = float(iter_t[iter_t > STALL_THRESHOLD_S].sum())
    # Ex-stall throughput: stalled time AND stalled iterations both
    # removed (ADVICE r4: dividing adjusted time by ALL iters counted
    # stalled frames as zero-cost work, slightly overstating the
    # headline). Matches bench_common.frame_stats' ex_stall semantics.
    dt = (total - stall_s) / max(iters - stalls, 1)
    fps = 1.0 / dt
    fps_as_printed = iters / total
    n_found = int(jnp.sum(out.result.meas_valid))

    result = {
        "metric": "tracking_fps_640x480_2048pts",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),   # ref video-rate envelope
        "stalls": stalls,
        "stall_total_s": round(stall_s, 2),
        # The headline "value" is the EX-STALL fps (stalled iterations
        # and their wall time both excluded); the raw number is below.
        "value_is_ex_stall": True,
        "fps_as_printed": round(fps_as_printed, 2),
    }
    print(f"# n_found={n_found} map_points={n} "
          f"frame_time={dt*1000:.1f}ms stalls={stalls}", file=sys.stderr)

    # Engine-level metric (the product path, mapping active) in the same
    # artifact. Guarded: an engine-bench failure must not lose the
    # tracking headline.
    if "--no-engine" not in sys.argv and not (bf16 or bf16_cross):
        try:
            from bench_engine import run_engine_bench
            result["engine"] = run_engine_bench()
        except Exception:
            traceback.print_exc()
            result["engine"] = {"error": "engine bench failed, see stderr"}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
