"""One-off: per-stage device timing (build vs track) on the real TPU.

Reuses bench.py's setup, but times the two jitted programs separately
with per-call blocking (latency, not pipelined throughput).
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ptam_cg_tpu.camera import atan
    from ptam_cg_tpu.config import EngineConfig
    from ptam_cg_tpu.io import synth
    from ptam_cg_tpu.models import keyframe, map_state, tracker
    from ptam_cg_tpu.utils import se3 as se3lib

    size = (640, 480)
    params = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
    seq = synth.SyntheticSequence(params, image_size=size, n_frames=8,
                                  seed=7, height=1.5, radius=0.2,
                                  sweep=0.6)
    cam = seq.cam

    f0 = seq.frame(0)
    ff0 = jax.jit(lambda x: keyframe.build_frame(
        x, candidate_min_score=50.0))(f0)
    pose0 = seq.pose(0)
    T_wc = se3lib.inv(pose0)

    P = 2048
    m = map_state.empty_map(size, max_points=P, max_kfs=4)
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

    cfg = EngineConfig()
    cam_params = jnp.asarray(params, jnp.float32)

    build_step = jax.jit(
        lambda im: keyframe.build_frame_tracking(im, cfg.frontend))
    track_step = jax.jit(
        lambda s, m_, ff, ps, k: tracker.track_frame(
            s, m_, ff, ps, cam, size, cam_params, k, cfg.tracker))

    state = tracker.init_tracker_state(pose0)
    frames = [seq.frame(i) for i in range(1, 8)]
    frames = [jax.device_put(f) for f in frames]
    prev_sbi = ff0.sbi_track

    ffw = build_step(frames[0])
    outw = track_step(state, m, ffw, prev_sbi, jax.random.PRNGKey(0))
    outw2 = track_step(outw.state, m, ffw, ffw.sbi_track,
                       jax.random.PRNGKey(1))
    jax.block_until_ready(outw2)
    state = outw.state

    # Per-stage PIPELINED device throughput (per-call blocking is
    # dominated by the tunnel RTT on this backend).
    iters = 30
    ffs = [build_step(f) for f in frames]
    jax.block_until_ready(ffs)

    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = build_step(frames[i % len(frames)])
    jax.block_until_ready(out)
    t_build = (time.perf_counter() - t0) / iters

    st = state
    t0 = time.perf_counter()
    for i in range(iters):
        o = track_step(st, m, ffs[i % len(ffs)], prev_sbi,
                       jax.random.PRNGKey(i))
        st = o.state
    st.pose.t.block_until_ready()
    t_track = (time.perf_counter() - t0) / iters

    # Pipelined total (bench.py style).
    st = state
    sbi = prev_sbi
    t0 = time.perf_counter()
    for i in range(iters):
        ff = build_step(frames[i % len(frames)])
        out = track_step(st, m, ff, sbi, jax.random.PRNGKey(i))
        st = out.state
        sbi = ff.sbi_track
    st.pose.t.block_until_ready()
    t_total = (time.perf_counter() - t0) / iters

    print(f"build  {t_build*1000:.2f} ms (blocking)")
    print(f"track  {t_track*1000:.2f} ms (blocking)")
    print(f"total  {t_total*1000:.2f} ms pipelined -> {1/t_total:.1f} FPS")

    # Fused single-dispatch variant: one RPC per frame instead of two.
    def fused(s, m_, im, ps, k):
        ff = keyframe.build_frame_tracking(im, cfg.frontend)
        return tracker.track_frame(s, m_, ff, ps, cam, size, cam_params,
                                   k, cfg.tracker), ff.sbi_track
    fused_step = jax.jit(fused)
    outf, sbif = fused_step(state, m, frames[0], prev_sbi,
                            jax.random.PRNGKey(0))
    outf, sbif = fused_step(outf.state, m, frames[0], sbif,
                            jax.random.PRNGKey(1))
    jax.block_until_ready(outf)
    st = outf.state
    sbi = sbif
    t0 = time.perf_counter()
    for i in range(iters):
        out, sbi = fused_step(st, m, frames[i % len(frames)], sbi,
                              jax.random.PRNGKey(i))
        st = out.state
    st.pose.t.block_until_ready()
    t_fused = (time.perf_counter() - t0) / iters
    print(f"fused  {t_fused*1000:.2f} ms pipelined -> {1/t_fused:.1f} FPS")


if __name__ == "__main__":
    main()
