"""Generate a TUM-RGBD-format dataset directory from the synthetic
renderer (PNG frames + rgb.txt + groundtruth.txt) — the offline stand-in
for a recorded fr1-class sequence in a no-network environment, replayed
through the exact dataset path the reference uses as its integration
harness (ref: src/VideoSource.cc:59-159).

Usage: python examples/make_synth_tum.py OUT_DIR [--frames N]
       [--size WxH] [--nonplanar] [--seed S]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--nonplanar", action="store_true",
                    help="add raised blocks (parallax + occlusion)")
    ap.add_argument("--png", action="store_true",
                    help="write 8-bit PNGs instead of .npy (needs PIL; "
                         "NOTE: the native C++ frame pump decodes only "
                         ".npy/.pgm — PNG datasets require the Python "
                         "reader, i.e. run_tum.py without --native)")
    ap.add_argument("--hostile", action="store_true",
                    help="photometric hostility: exposure/black-level "
                         "drift, sensor noise, vignette (validation "
                         "imagery the tracker was not tuned on)")
    ap.add_argument("--trajectory", choices=["orbit", "loop"],
                    default="orbit",
                    help="'loop' = full circuit returning to the start")
    ap.add_argument("--motion-blur", type=int, default=0,
                    help="exposure samples averaged per frame (velocity-"
                         "dependent directional blur; 0 = instant)")
    ap.add_argument("--rolling-shutter", type=float, default=0.0,
                    help="row-readout span as a fraction of the frame "
                         "period (row r lags by this * r/H)")
    ap.add_argument("--radius", type=float, default=0.35)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from ptam_cg_tpu.io import synth, tum

    w, h = (int(x) for x in args.size.split("x"))
    params = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
    boxes = synth.default_blocks(seed=2, n=4) if args.nonplanar else None
    seq = synth.SyntheticSequence(params, image_size=(w, h),
                                  n_frames=args.frames, seed=args.seed,
                                  height=1.5, radius=args.radius,
                                  sweep=1.3, boxes=boxes,
                                  trajectory=args.trajectory,
                                  hostile=args.hostile,
                                  motion_blur=args.motion_blur,
                                  rolling_shutter=args.rolling_shutter)
    frames = (seq.frame(i) for i in range(args.frames))
    poses = [seq.pose(i) for i in range(args.frames)]
    tum.write_synthetic_dataset(args.out, frames, poses=poses,
                                png=args.png)
    kind = "PNG" if args.png else ".npy"
    print(f"wrote {args.frames} {kind} frames + groundtruth -> {args.out}")


if __name__ == "__main__":
    main()
