"""Prior-generation protocol run: generate visibility priors at protocol
resolution on the TPU, sanity-check them against known geometry, then train a
demo1a-shaped 50k run that CONSUMES the generated masks.

This closes the last reference pipeline stage never protocol-proven (VERDICT
round-4 item 1): in the reference workflow the offline generator
(/root/reference/src/prior_generators/visibility/VisibilityMask02_NeRF_LLFF.py:229-285)
produces the masks/weights training's VisibilityPriorLoss consumes after the
30k activation; every previous protocol run here used hand-synthesized masks
from data/synthetic.py instead.

Stages (each restart-safe):
1. synthetic LLFF database at 756x1008 down4 WITHOUT hand-written visibility
   priors (GT depths saved separately for the geometry check);
2. vipnerf_tpu.priors.visibility through the CLI policy table: VW02, 64
   inverse-linspace planes from DepthBounds.csv, both ordered directions per
   train pair, temperature 10 (reference :295 policy) — per-pair wall clock
   printed;
3. geometric sanity check: masks vs exact cross-view visibility derived from
   GT depths/poses (projection + occlusion test) — must beat the best
   constant predictor;
4. nerf_llff._run_full with demo1a's exact arguments at 50k iterations — the
   loader picks up visibility_prior/VW02, so the post-30k
   VisibilityPriorLoss optimizes against generator output;
5. optional --sweep: demo4-style test+QA per Model_Iter* checkpoint
   (reference NerfLlffTrainerTester01.py:956-972) for the
   quality-vs-iteration curve.

Usage: python tools/run_priorgen_50k.py [--workdir /tmp/priorgen_50k]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402


def geometric_visibility(depth1, w2c1, k1, depth2, w2c2, k2, tol=0.03):
    """Exact cross-view visibility of frame1's pixels w.r.t. frame2.

    Backproject every frame1 pixel to 3D with its GT depth, project into
    frame2, and mark visible iff the projection lands in-frame AND is not
    occluded (frame2's GT depth at the landing pixel >= the point's
    camera-2 z-depth within `tol` relative tolerance).
    """
    h, w = depth1.shape
    x, y = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64), indexing="xy")
    pix = np.stack([x, y, np.ones_like(x)], axis=-1)
    pts_cam1 = depth1[..., None] * (pix @ np.linalg.inv(k1).T)
    c2w1 = np.linalg.inv(w2c1)
    pts_world = pts_cam1 @ c2w1[:3, :3].T + c2w1[:3, 3]
    cam2 = pts_world @ w2c2[:3, :3].T + w2c2[:3, 3]
    z2 = cam2[..., 2]
    proj = cam2 @ k2.T
    xy2 = proj[..., :2] / np.maximum(proj[..., 2:3], 1e-9)
    in_frame = (
        (z2 > 0)
        & (xy2[..., 0] >= 0) & (xy2[..., 0] <= w - 1)
        & (xy2[..., 1] >= 0) & (xy2[..., 1] <= h - 1)
    )
    xi = np.clip(np.round(xy2[..., 0]).astype(int), 0, w - 1)
    yi = np.clip(np.round(xy2[..., 1]).astype(int), 0, h - 1)
    d2 = depth2[yi, xi]
    return in_frame & (z2 <= d2 * (1 + tol) + 0.01)


def check_masks(db_dir: Path, gt_path: Path, train_frames) -> dict:
    """Compare generated VW02 masks to geometric GT; returns stats."""
    from vipnerf_tpu.utils.io import read_mask

    gt = np.load(gt_path)
    depths, extr, intr = gt["depths"], gt["extrinsics"], gt["intrinsics"]
    vis_dir = db_dir / "all/visibility_prior/VW02/synth01/visibility_masks"
    stats = {}
    for f1 in train_frames:
        for f2 in train_frames:
            if f1 == f2:
                continue
            mask = read_mask(vis_dir / f"{f1:04}_{f2:04}.png")
            if mask.ndim == 3:
                mask = mask[..., 0]
            mask = mask > 0
            gt_vis = geometric_visibility(
                depths[f1], extr[f1], intr[f1],
                depths[f2], extr[f2], intr[f2],
            )
            agree = float(np.mean(mask == gt_vis))
            # precision/recall of the generated mask treating GT-visible as
            # the positive class
            tp = float(np.sum(mask & gt_vis))
            prec = tp / max(float(np.sum(mask)), 1.0)
            rec = tp / max(float(np.sum(gt_vis)), 1.0)
            const_best = max(float(np.mean(gt_vis)), 1 - float(np.mean(gt_vis)))
            stats[f"{f1:04}_{f2:04}"] = {
                "agreement": round(agree, 4),
                "precision": round(prec, 4),
                "recall": round(rec, 4),
                "mask_mean": round(float(np.mean(mask)), 4),
                "gt_visible_mean": round(float(np.mean(gt_vis)), 4),
                "const_predictor": round(const_best, 4),
            }
            print(f"  mask {f1:04}_{f2:04}: {stats[f'{f1:04}_{f2:04}']}",
                  flush=True)
            assert 0.02 < float(np.mean(mask)) < 0.995, (
                "generated mask is degenerate (all-ones/all-zeros)"
            )
            assert agree > const_best - 0.02, (
                f"mask agreement {agree:.3f} does not beat the constant "
                f"predictor {const_best:.3f} — generator output inconsistent "
                "with scene geometry"
            )
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/priorgen_50k")
    ap.add_argument("--iters", type=int, default=50000)
    ap.add_argument("--height", type=int, default=756)
    ap.add_argument("--width", type=int, default=1008)
    ap.add_argument("--train_num", type=int, default=11)
    ap.add_argument("--video_frames", type=int, default=30)
    ap.add_argument("--sweep", action="store_true",
                    help="demo4-style test+QA per checkpoint after training")
    args = ap.parse_args()

    from vipnerf_tpu.data.synthetic import write_synthetic_database
    from vipnerf_tpu.db_builders.nerf_llff import create_spiral_video_poses
    from vipnerf_tpu.priors.cli import main_visibility

    workdir = Path(args.workdir)
    db_root = workdir / "data/databases"
    db_dir = db_root / "NeRF_LLFF/data"
    train_frames = (0, 5)
    gt_path = workdir / "gt_geometry.npz"

    # -- stage 1: database WITHOUT hand-written visibility priors ----------
    t0 = time.time()
    db_marker = db_dir / ".synthetic_db_complete"
    if not db_marker.exists():
        print("generating synthetic database (no hand-written priors)...",
              flush=True)
        gt = write_synthetic_database(
            db_root,
            scene_name="synth01",
            num_frames=6,
            train_frames=train_frames,
            val_frames=(2,),
            height=args.height,
            width=args.width,
            resolution_suffix="_down4",
            with_visibility_prior=False,
        )
        np.savez_compressed(
            gt_path,
            depths=gt["depths"],
            extrinsics=gt["extrinsics"],
            intrinsics=gt["intrinsics"],
        )
        create_spiral_video_poses(
            db_dir, set_num=2, num_frames=args.video_frames
        )
        db_marker.touch()
    hand_dir = db_dir / "all/visibility_prior/VW02/synth01"
    print(f"db ready in {time.time() - t0:.0f}s "
          f"(hand-written priors present: {hand_dir.exists()})", flush=True)

    # -- stage 2: generate the visibility prior on the TPU -----------------
    t1 = time.time()
    main_visibility([
        "--database", "NeRF_LLFF", "--gen_nums", "2",
        "--root_dirpath", str(workdir),
    ])
    gen_wall = time.time() - t1
    n_pairs = len(train_frames) * (len(train_frames) - 1) // 2
    print(f"PRIOR GENERATION WALL CLOCK: {gen_wall:.1f}s "
          f"({n_pairs} unordered pairs, both directions each)", flush=True)

    # -- stage 3: geometric sanity check ------------------------------------
    stats = check_masks(db_dir, gt_path, train_frames)
    print("MASK_GEOMETRY_STATS:", json.dumps(stats), flush=True)

    # -- stage 4: demo1a-shaped 50k run consuming the generated masks ------
    os.chdir(workdir)
    from vipnerf_tpu.apps import nerf_llff

    t2 = time.time()
    nerf_llff._run_full(
        args.train_num, 2, sparse_depth=True, num_rays=2048,
        num_iterations=args.iters, scene_names=["synth01"],
    )
    wall = time.time() - t2
    print(f"PRIORGEN DEMO1A WALL CLOCK: {wall:.0f}s", flush=True)

    qa_path = workdir / f"runs/testing/test{args.train_num:04}/QA_Scores.json"
    if qa_path.exists():
        print("QA_Scores.json:", qa_path.read_text(), flush=True)

    # VPL descent check: the post-30k VisibilityPriorLoss trend against
    # GENERATED masks (the point of this run)
    scalars = (workdir / f"runs/training/train{args.train_num:04}/synth01"
               / "logs/scalars.jsonl")
    vpl = []
    if scalars.exists():
        with open(scalars) as f:
            for line in f:
                rec = json.loads(line)
                if rec["tag"] == "train/VisibilityPriorLoss01":
                    vpl.append((rec["step"], rec["value"]))
    post = [(s, v) for s, v in vpl if s >= 30000]
    if post:
        print(f"VPL@30k={post[0][1]:.4f} VPL@end={post[-1][1]:.4f} "
              f"(steps {post[0][0]}..{post[-1][0]})", flush=True)

    # -- stage 5 (optional): per-checkpoint QA sweep (demo4 surface) --------
    if args.sweep:
        from vipnerf_tpu.apps.configs import build_test_configs

        for it in range(10000, args.iters + 1, 10000):
            test_configs = build_test_configs(
                entry_name="NerfLlffTrainerTester01",
                test_num=900 + it // 10000,
                train_num=args.train_num,
                set_num=2,
                database="NeRF_LLFF",
                database_dirpath="NeRF_LLFF/data",
                num_iterations=it,
                scene_key="scene_names",
                scene_ids=["synth01"],
                resolution_suffix="_down4",
            )
            nerf_llff.app.start_testing(test_configs)

    print("SUMMARY:", json.dumps({
        "iters": args.iters,
        "gen_wall_s": round(gen_wall, 1),
        "train_wall_s": round(wall, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
