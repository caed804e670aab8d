"""Synthetic scene generation: analytic test scenes + reference-layout
database writer.

The reference ships no test fixtures (SURVEY.md §4); this module provides
them: a procedural scene (colored spheres in a box, rendered by an exact
ray-marcher) written to disk in the exact NeRF_LLFF / RealEstate10K / DTU
database layout (see vipnerf_tpu.data.loaders.base for the contract), so unit
and end-to-end tests exercise the same loader/preprocessor/QA paths as real
data.
"""

from pathlib import Path
from typing import Dict, Optional

import numpy as np


def look_at_w2c(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """World-to-camera extrinsic for a camera at `eye` looking at `target`,
    in the Colmap convention (+z forward) that the database stores."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    r = np.stack([right, down, fwd], axis=0)  # rows: camera axes in world
    t = -r @ eye
    w2c = np.eye(4)
    w2c[:3, :3] = r
    w2c[:3, 3] = t
    return w2c


class SphereScene:
    """A few emissive spheres inside an enclosing textured shell.

    Every ray hits geometry (like the LLFF forward-facing scenes the
    visibility losses were designed for) — with an unbounded empty background
    the bidirectional VisibilityLoss fights the photometric loss and training
    stalls, which is a scene property, not a framework one.
    Supports exact color / z-depth rendering.
    """

    def __init__(self, seed: int = 0, num_spheres: int = 4,
                 shell_radius: float = 6.0):
        rng = np.random.default_rng(seed)
        self.centers = rng.uniform(-0.6, 0.6, size=(num_spheres, 3))
        self.centers[:, 2] = rng.uniform(-0.5, 0.5, size=num_spheres)
        self.radii = rng.uniform(0.15, 0.3, size=num_spheres)
        self.colors = rng.uniform(0.2, 1.0, size=(num_spheres, 3))
        self.shell_radius = shell_radius
        self.background = np.array([0.05, 0.05, 0.1])  # shell base color

    def _shell_color(self, points: np.ndarray) -> np.ndarray:
        """Low-frequency texture on the enclosing shell."""
        px, py, pz = points[..., 0], points[..., 1], points[..., 2]
        r = 0.5 + 0.35 * np.sin(1.3 * px) * np.cos(0.9 * py)
        g = 0.45 + 0.35 * np.sin(1.1 * py + 1.0) * np.cos(0.7 * pz)
        b = 0.55 + 0.3 * np.sin(0.8 * pz + 2.0) * np.cos(1.2 * px)
        return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)

    def render(self, w2c: np.ndarray, intrinsic: np.ndarray, h: int, w: int):
        """Exact ray-traced rgb (h, w, 3 in [0,1]) and z-depth (h, w).

        Depth is the camera z-depth (z = r3^T (X - C), the COLMAP/NeRF
        convention used by the sparse-depth prior and the rendered depth
        maps), NOT the Euclidean ray length.
        """
        c2w = np.linalg.inv(w2c)
        x, y = np.meshgrid(np.arange(w, dtype=np.float64),
                           np.arange(h, dtype=np.float64), indexing="xy")
        pix = np.stack([x, y, np.ones_like(x)], axis=-1)
        dirs_cam = pix @ np.linalg.inv(intrinsic).T  # +z forward (Colmap)
        dirs = dirs_cam @ c2w[:3, :3].T
        norms = np.linalg.norm(dirs, axis=-1)
        dirs = dirs / norms[..., None]
        origin = c2w[:3, 3]

        t_best = np.full((h, w), np.inf)
        color = np.zeros((h, w, 3))
        # enclosing shell (always hit from inside)
        oc = origin  # shell centered at origin
        b = np.sum(dirs * oc, axis=-1)
        disc = b ** 2 - (np.sum(oc ** 2) - self.shell_radius ** 2)
        t_shell = -b + np.sqrt(np.maximum(disc, 0.0))
        hit_pts = origin + dirs * t_shell[..., None]
        t_best = t_shell
        color = self._shell_color(hit_pts)

        for c, r, col in zip(self.centers, self.radii, self.colors):
            oc = origin - c
            b = np.sum(dirs * oc, axis=-1)
            disc = b ** 2 - (np.sum(oc ** 2) - r ** 2)
            hit = disc > 0
            t = -b - np.sqrt(np.where(hit, disc, 0.0))
            valid = hit & (t > 1e-3) & (t < t_best)
            t_best = np.where(valid, t, t_best)
            color = np.where(valid[..., None], col, color)

        # Euclidean ray length -> camera z-depth: t was measured along unit
        # dirs; the camera-frame z component of the unit dir is
        # (dirs_cam_z=1) / |dirs_cam|.
        z_depth = t_best / np.linalg.norm(dirs_cam, axis=-1)
        return color, z_depth


def make_dtu_scene(seed: int = 0):
    """Scene + camera-rig geometry that fits the DTU dataset contract.

    The DTU loader uses FIXED depth bounds [0.1, 5] regardless of the scene
    (matching /root/reference/src/data_loaders/DtuDataLoader01.py:66 — real
    DTU data is scale_mat-normalized into those bounds by the database
    builder). A synthetic DTU scene must therefore keep every ray's z-depth
    inside [0.1, 5]: the default rig (cameras at radius 3 inside a shell of
    radius 6, depths 3..9) silently puts most of the scene BEYOND far=5,
    making it unfittable (sampling never reaches it) — which stalls MSE and
    sparse-depth losses and, under the loss-conflict dynamics documented in
    BASELINE.md, eventually triggers the dead-sigma collapse.

    Geometry here: cameras at radius 1.2 (height 0.25, |eye| ~= 1.23) inside
    a shell of radius 2.2 -> z-depths in ~[0.4, 3.5], comfortably inside the
    fixed bounds.

    Returns (scene, ring_kwargs) for write_synthetic_database.
    """
    scene = SphereScene(seed=seed, shell_radius=2.2)
    return scene, {"ring_radius": 1.2, "ring_height": 0.25}


def make_camera_ring(
    num_cameras: int,
    radius: float = 3.0,
    height: float = 0.4,
    spread_deg: float = 40.0,
) -> np.ndarray:
    """w2c extrinsics on an arc looking at the origin (forward-facing rig)."""
    angles = np.deg2rad(
        np.linspace(-spread_deg / 2, spread_deg / 2, num_cameras)
    )
    mats = []
    for a in angles:
        eye = np.array([radius * np.sin(a), height, radius * np.cos(a)])
        mats.append(look_at_w2c(eye, np.zeros(3), np.array([0.0, 1.0, 0.0])))
    return np.stack(mats)


def write_synthetic_database(
    root: Path,
    *,
    dataset: str = "NeRF_LLFF",
    scene_name: str = "synth01",
    num_frames: int = 6,
    set_num: int = 2,
    train_frames=(0, 5),
    val_frames=(2,),
    height: int = 48,
    width: int = 64,
    seed: int = 0,
    resolution_suffix: str = "",
    with_sparse_depth: bool = True,
    sparse_depth_dirname: str = "DE02",
    with_visibility_prior: bool = True,
    visibility_dirname: str = "VW02",
    scene: Optional[SphereScene] = None,
    ring_radius: float = 3.0,
    ring_height: float = 0.4,
) -> Dict[str, np.ndarray]:
    """Write a synthetic scene in the reference database layout.

    Returns dict with the ground-truth arrays (images, extrinsics, intrinsics,
    depths) for test assertions.
    """
    from vipnerf_tpu.utils.io import save_image

    root = Path(root)
    scene = scene or SphereScene(seed=seed)

    from vipnerf_tpu.utils.naming import scene_dirname

    split_dir = {"NeRF_LLFF": "all", "RealEstate10K": "test", "DTU": "all"}[dataset]
    data_dir = root / dataset / "data"
    # on-disk directories follow the loader's naming rule: scene_num datasets
    # zero-pad to 5 digits (utils/naming.scene_dirname), LLFF uses the name
    scene_key0 = "scene_name" if dataset == "NeRF_LLFF" else "scene_num"
    scene_dirname_str = scene_dirname(scene_name, scene_key0)
    scene_dir = data_dir / f"{split_dir}/database_data/{scene_dirname_str}"
    rgb_dir = scene_dir / f"rgb{resolution_suffix}"
    rgb_dir.mkdir(parents=True, exist_ok=True)

    focal = 0.9 * width
    intrinsic = np.array(
        [[focal, 0, width / 2.0], [0, focal, height / 2.0], [0, 0, 1.0]]
    )
    extrinsics = make_camera_ring(
        num_frames, radius=ring_radius, height=ring_height
    )

    images, depths = [], []
    for i in range(num_frames):
        rgb, depth = scene.render(extrinsics[i], intrinsic, height, width)
        img8 = np.round(np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        save_image(rgb_dir / f"{i:04}.png", img8)
        images.append(img8)
        depths.append(depth)
    images = np.stack(images)
    depths = np.stack(depths)

    np.savetxt(
        scene_dir / "CameraExtrinsics.csv",
        extrinsics.reshape(num_frames, 16),
        delimiter=",",
    )
    np.savetxt(
        scene_dir / f"CameraIntrinsics{resolution_suffix}.csv",
        np.tile(intrinsic.reshape(1, 9), (num_frames, 1)),
        delimiter=",",
    )
    pos_depths = np.where(depths > 0, depths, np.inf)
    bounds = np.stack(
        [
            np.minimum(pos_depths.reshape(num_frames, -1).min(1), 1e3) * 0.8,
            depths.reshape(num_frames, -1).max(1) * 1.2 + 1.0,
        ],
        axis=1,
    )
    np.savetxt(scene_dir / "DepthBounds.csv", bounds, delimiter=",")

    # train/val/test split CSVs
    sets_dir = data_dir / f"train_test_sets/set{set_num:02}"
    sets_dir.mkdir(parents=True, exist_ok=True)
    scene_key = "scene_name" if dataset == "NeRF_LLFF" else "scene_num"
    scene_val = scene_name if dataset == "NeRF_LLFF" else int(scene_name)

    def write_split(mode, frames):
        # Merge with any existing split CSV (multi-scene databases are built
        # one scene per call): keep other scenes' rows, replace this scene's.
        path = sets_dir / f"{mode}VideosData.csv"
        lines = [f"{scene_key},pred_frame_num"]
        if path.exists():
            existing = path.read_text().splitlines()
            if existing and existing[0] != lines[0]:
                # A stale CSV from a different dataset/scene_key in the same
                # sets dir: overwriting would silently drop its rows and
                # shrink a multi-scene split.
                raise ValueError(
                    f"{path} header {existing[0]!r} does not match expected "
                    f"{lines[0]!r}; refusing to overwrite a foreign split CSV"
                )
            lines += [
                row for row in existing[1:]
                if row and row.split(",")[0] != str(scene_val)
            ]
        lines += [f"{scene_val},{f}" for f in frames]
        path.write_text("\n".join(lines) + "\n")

    test_frames = [
        f for f in range(num_frames) if f not in train_frames and f not in val_frames
    ]
    write_split("Train", train_frames)
    write_split("Validation", val_frames)
    write_split("Test", test_frames)

    if with_sparse_depth:
        rng = np.random.default_rng(seed + 1)
        sd_dir = (
            data_dir
            / f"{split_dir}/estimated_depths/{sparse_depth_dirname}/{scene_dirname_str}/estimated_depths{resolution_suffix}"
        )
        sd_dir.mkdir(parents=True, exist_ok=True)
        for f in train_frames:
            ys, xs = np.where(depths[f] > 0)
            # COLMAP produces thousands of features per LLFF image; an
            # unrealistically tiny pool makes the 2048-ray sparse-depth
            # stream repeat each point ~10x per batch and destabilizes the
            # visibility-loss interaction.
            k = min(max(200, height * width // 25), len(xs))
            sel = rng.choice(len(xs), size=k, replace=False)
            rows = ["x,y,depth,reprojection_error"]
            for j in sel:
                rows.append(
                    f"{xs[j]},{ys[j]},{depths[f][ys[j], xs[j]]:.6f},{rng.uniform(0.1, 1.0):.4f}"
                )
            (sd_dir / f"{f:04}.csv").write_text("\n".join(rows) + "\n")

    if with_visibility_prior:
        vis_dir = data_dir / f"{split_dir}/visibility_prior/{visibility_dirname}/{scene_dirname_str}"
        masks_dir = vis_dir / "visibility_masks"
        weights_dir = vis_dir / "visibility_weights"
        masks_dir.mkdir(parents=True, exist_ok=True)
        weights_dir.mkdir(parents=True, exist_ok=True)
        for f1 in train_frames:
            for f2 in train_frames:
                if f1 == f2:
                    continue
                # crude but valid prior: foreground pixels marked visible
                mask = (depths[f1] > 0).astype(np.uint8) * 255
                save_image(masks_dir / f"{f1:04}_{f2:04}.png", mask)
                np.save(
                    weights_dir / f"{f1:04}_{f2:04}.npy",
                    (depths[f1] > 0).astype(np.float32) * 0.9 + 0.05,
                )

    return {
        "images": images,
        "depths": depths,
        "extrinsics": extrinsics,
        "intrinsics": np.tile(intrinsic[None], (num_frames, 1, 1)),
        "bounds": bounds,
        "scene": scene,
    }
