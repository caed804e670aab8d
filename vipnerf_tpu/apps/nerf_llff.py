"""NeRF-LLFF entry point.

Parity target: src/NerfLlffTrainerTester01.py (paths relative to
/root/reference/): demo1a/1b/1c = full ViP-NeRF at 2/3/4 input views
(train 11/12/13, 200k iters, :228-472); demo1d/1e/1f = visibility-prior-only
ablation (train 14/15/16, 1024 rays, no sparse depth, 50k iters, :594-820);
demo2 resume (:933), demo3 plot export (:943), demo4 test-only (:956).

Run: python -m vipnerf_tpu.apps.nerf_llff demo1a
"""

import sys
from pathlib import Path

from vipnerf_tpu.apps.common import DatasetApp, run_main
from vipnerf_tpu.apps.configs import build_test_configs, build_train_configs

ENTRY_NAME = "NerfLlffTrainerTester01"
SCENES = ["fern", "flower", "fortress", "horns", "leaves", "orchids", "room", "trex"]

app = DatasetApp("NeRF_LLFF", "scene_name", "all")

_COMMON = dict(
    entry_name=ENTRY_NAME,
    database="NeRF_LLFF",
    database_dirpath="databases/NeRF_LLFF/data",
    data_loader_name="NerfLlffDataLoader01",
    scene_key="scene_names",
    ndc=True,
    recenter_camera_poses=True,
    bd_factor=0.75,
    resolution_suffix="_down4",
)


def _run_full(train_num: int, set_num: int, *, sparse_depth: bool,
              num_rays: int, num_iterations: int, scene_names=None):
    scene_names = scene_names or SCENES
    for scene_name in scene_names:
        train_configs = build_train_configs(
            train_num=train_num,
            scene_ids=[scene_name],
            set_num=set_num,
            num_iterations=num_iterations,
            num_rays=num_rays,
            sparse_depth=sparse_depth,
            **_COMMON,
        )
        test_configs = build_test_configs(
            entry_name=ENTRY_NAME,
            test_num=train_num,
            train_num=train_num,
            set_num=set_num,
            database="NeRF_LLFF",
            database_dirpath="NeRF_LLFF/data",
            num_iterations=num_iterations,
            scene_key="scene_names",
            scene_ids=[scene_name],
            resolution_suffix="_down4",
        )
        app.start_training(train_configs)
        app.start_testing(test_configs)
        app.start_testing_videos(test_configs)
        app.start_testing_static_videos(test_configs)


def demo1a():
    _run_full(11, 2, sparse_depth=True, num_rays=2048, num_iterations=200000)


def demo1b():
    _run_full(12, 3, sparse_depth=True, num_rays=2048, num_iterations=200000)


def demo1c():
    _run_full(13, 4, sparse_depth=True, num_rays=2048, num_iterations=200000)


def demo1d():
    _run_full(14, 2, sparse_depth=False, num_rays=1024, num_iterations=50000)


def demo1e():
    _run_full(15, 3, sparse_depth=False, num_rays=1024, num_iterations=50000)


def demo1f():
    _run_full(16, 4, sparse_depth=False, num_rays=1024, num_iterations=50000)


def demo2():
    """Resume training of an existing run (reference demo2 :933-940)."""
    configs = {
        "trainer": f"{ENTRY_NAME}/VipNerfTpuTrainer",
        "train_num": 12,
        "resume_training": True,
    }
    app.start_training(configs)


def demo3():
    """Export loss plots from logged scalars (reference demo3 :943-953)."""
    from vipnerf_tpu.train.logging import export_plots

    train_num = 12
    scene_name = "horns"
    export_plots(Path(f"runs/training/train{train_num:04}/{scene_name}/logs"))
    sys.exit(0)


def demo4():
    """Test-only over existing checkpoints (reference demo4 :956-972)."""
    for train_num in (11, 12, 13):
        test_configs = build_test_configs(
            entry_name=ENTRY_NAME,
            test_num=train_num,
            train_num=train_num,
            set_num=2,
            database="NeRF_LLFF",
            database_dirpath="NeRF_LLFF/data",
            num_iterations=50000,
            scene_key="scene_names",
            scene_ids=SCENES,
            resolution_suffix="_down4",
        )
        app.start_testing(test_configs)
        app.start_testing_videos(test_configs)
        app.start_testing_static_videos(test_configs)


DEMOS = {
    "demo1a": demo1a, "demo1b": demo1b, "demo1c": demo1c,
    "demo1d": demo1d, "demo1e": demo1e, "demo1f": demo1f,
    "demo2": demo2, "demo3": demo3, "demo4": demo4,
}


def main():
    run_main(DEMOS, default=["demo1a", "demo1b", "demo1c", "demo1d", "demo1e", "demo1f"])  # reference main() runs all six


if __name__ == "__main__":
    main()
