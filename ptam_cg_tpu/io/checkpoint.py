"""Map / engine checkpointing: save AND resume.

The reference can only dump (SaveMap writes point positions + KF poses to
text files, ref: src/MapMaker.cc:1229-1257) with no way to load. Here the
whole MapState pytree round-trips through one compressed ``.npz`` so a
session — including the distributed global BA — can restart from disk
(SURVEY §5.4 gap).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ptam_cg_tpu.models.map_state import MapState
from ptam_cg_tpu.models.tracker import TrackerState
from ptam_cg_tpu.utils.se3 import SE3


def save_map(path: str, m: MapState,
             tracker_state: Optional[TrackerState] = None,
             meta: Optional[dict] = None) -> None:
    arrays = {f"map.{k}": np.asarray(v) for k, v in m._asdict().items()
              if not isinstance(v, tuple)}
    # SBI NamedTuple fields are flat arrays already; MapState holds none.
    if tracker_state is not None:
        arrays["trk.pose_R"] = np.asarray(tracker_state.pose.R)
        arrays["trk.pose_t"] = np.asarray(tracker_state.pose.t)
        arrays["trk.velocity"] = np.asarray(tracker_state.velocity)
        arrays["trk.scalars"] = np.array([
            float(tracker_state.msd_vel), float(tracker_state.lost_frames),
            float(tracker_state.quality),
            float(tracker_state.just_recovered),
            float(tracker_state.depth_mean),
            float(tracker_state.depth_sigma)])
        arrays["trk.key"] = np.asarray(tracker_state.key)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_map(path: str):
    """Returns (MapState, TrackerState | None)."""
    data = np.load(path)
    fields = {}
    for name in MapState._fields:
        fields[name] = jnp.asarray(data[f"map.{name}"])
    m = MapState(**fields)
    trk = None
    if "trk.pose_R" in data:
        s = data["trk.scalars"]
        trk = TrackerState(
            pose=SE3(jnp.asarray(data["trk.pose_R"]),
                     jnp.asarray(data["trk.pose_t"])),
            velocity=jnp.asarray(data["trk.velocity"]),
            msd_vel=jnp.float32(s[0]),
            lost_frames=jnp.int32(int(s[1])),
            quality=jnp.int32(int(s[2])),
            just_recovered=jnp.asarray(bool(s[3])),
            depth_mean=jnp.float32(s[4]),
            depth_sigma=jnp.float32(s[5]),
            key=(jnp.asarray(data["trk.key"]) if "trk.key" in data
                 else jax.random.PRNGKey(0)))
    return m, trk


def save_ba_state(path: str, state) -> None:
    """Checkpoint a mid-flight bundle-adjustment ``LMState`` (including
    its BundleProblem) so a distributed global BA can restart after a
    host/device failure (SURVEY §5.3: "recompute from checkpoint" — the
    reference has no process-level fault tolerance). Arrays are pulled to
    host, so the checkpoint is mesh-independent: resume may use a
    different device count (elastic recovery)."""
    arrays = {}
    for k, v in state.problem._asdict().items():
        arrays[f"prob.{k}"] = np.asarray(v)
    for k in ("lam", "lam_factor", "converged", "accepted", "iters",
              "last_error", "failed"):
        arrays[f"lm.{k}"] = np.asarray(getattr(state, k))
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load_ba_state(path: str):
    """Inverse of ``save_ba_state``; returns an ``LMState`` on the default
    device (re-shard with ``parallel.sharded_ba.shard_problem`` or pass to
    ``compute_sharded`` / ``resume_sharded``)."""
    from ptam_cg_tpu.models.bundle import BundleProblem, LMState

    data = np.load(path)
    prob = BundleProblem(**{
        name: jnp.asarray(data[f"prob.{name}"])
        for name in BundleProblem._fields})
    return LMState(
        problem=prob,
        lam=jnp.asarray(data["lm.lam"]),
        lam_factor=jnp.asarray(data["lm.lam_factor"]),
        converged=jnp.asarray(data["lm.converged"]),
        accepted=jnp.asarray(data["lm.accepted"]),
        iters=jnp.asarray(data["lm.iters"]),
        last_error=jnp.asarray(data["lm.last_error"]),
        failed=(jnp.asarray(data["lm.failed"]) if "lm.failed" in data
                else jnp.asarray(False)))


def export_map_text(path_prefix: str, m: MapState) -> None:
    """Reference-compatible text dump (SaveMap parity,
    ref: src/MapMaker.cc:1229-1257): ``<prefix>map.dump`` with point
    positions + source levels, and per-KF ``.info`` pose files."""
    valid = np.asarray(m.point_valid)
    pos = np.asarray(m.point_pos)
    lvl = np.asarray(m.point_src_level)
    with open(path_prefix + "map.dump", "w") as f:
        for i in np.nonzero(valid)[0]:
            f.write(f"{pos[i, 0]} {pos[i, 1]} {pos[i, 2]}  {lvl[i]}\n")
    kf_valid = np.asarray(m.kf_valid)
    R = np.asarray(m.kf_R)
    t = np.asarray(m.kf_t)
    os.makedirs(path_prefix + "keyframes", exist_ok=True)
    for k in np.nonzero(kf_valid)[0]:
        with open(os.path.join(path_prefix + "keyframes",
                               f"{k}.info"), "w") as f:
            for row in range(3):
                f.write(" ".join(str(x) for x in R[k, row])
                        + f" {t[k, row]}\n")
