"""Direct unit tests for the LR decayers and the QA scene-wise grouper
(both otherwise exercised only through e2e flows)."""

import numpy as np
import pandas as pd

from vipnerf_tpu.qa.grouper import get_grouped_qa_scores, group_qa_scores
from vipnerf_tpu.train.lr_schedules import get_lr_schedule


class TestLrSchedules:
    def test_nerf_decayer_closed_form(self):
        # reference NeRFLearningRateDecayer01.py:17-26:
        # lr = lr_initial * 0.1^(iter / (lr_decay * 1000))
        sched = get_lr_schedule({
            "optimizer": {
                "lr_decayer_name": "NeRFLearningRateDecayer01",
                "lr_initial": 5e-4, "lr_decay": 250,
            }
        })
        assert np.isclose(float(sched(0)), 5e-4)
        assert np.isclose(float(sched(250000)), 5e-5)
        assert np.isclose(float(sched(1201)), 5e-4 * 0.1 ** (1201 / 250000))

    def test_mip_decayer_reference_config_keys(self):
        # reference MipNeRFLearningRateDecayer01.py:18-35 with ITS key names
        # (lr_decay_steps/lr_decay_mult, num_iterations at top level)
        configs = {
            "num_iterations": 1000,
            "optimizer": {
                "lr_decayer_name": "MipNeRFLearningRateDecayer01",
                "lr_initial": 1e-3, "lr_final": 1e-5,
                "lr_decay_steps": 100, "lr_decay_mult": 0.1,
            },
        }
        sched = get_lr_schedule(configs)

        def expected(it):
            decay = 0.1 + 0.9 * np.sin(0.5 * np.pi * np.clip(it / 100, 0, 1))
            t = np.clip(it / 1000, 0, 1)
            return decay * np.exp(np.log(1e-3) * (1 - t) + np.log(1e-5) * t)

        for it in (0, 10, 100, 500, 1000):
            assert np.isclose(float(sched(it)), expected(it), rtol=1e-5), it
        # warmup: depressed early, full log-lerp once past delay steps
        assert float(sched(0)) < float(sched(100))

    def test_unknown_decayer_raises(self):
        import pytest

        with pytest.raises(RuntimeError, match="Unknown lr decayer"):
            get_lr_schedule({"optimizer": {"lr_decayer_name": "Nope99"}})


class TestSceneWiseGrouper:
    def test_group_means_and_rounding(self):
        # reference SceneWiseGrouper.py:17-34: group by non-frame columns,
        # mean the metric, round to 4
        df = pd.DataFrame({
            "scene_name": ["a", "a", "b", "b"],
            "pred_frame_num": [0, 1, 0, 1],
            "PSNR": [20.11111, 22.0, 30.0, 31.0],
        })
        out = get_grouped_qa_scores(df)
        assert list(out.columns) == ["scene_name", "PSNR"]
        assert out.loc[out.scene_name == "a", "PSNR"].item() == 21.0556
        assert out.loc[out.scene_name == "b", "PSNR"].item() == 30.5

    def test_filesystem_walk(self, tmp_path):
        qa_dir = tmp_path / "test0007/QA_Scores/predicted_frames"
        qa_dir.mkdir(parents=True)
        pd.DataFrame({
            "scene_name": ["a", "a"],
            "pred_frame_num": [0, 1],
            "PSNR02": [20.0, 24.0],
        }).to_csv(qa_dir / "PSNR02_FrameWise.csv", index=False)
        group_qa_scores(tmp_path, [7])
        out = pd.read_csv(qa_dir / "PSNR02_SceneWise.csv")
        assert out["PSNR02"].item() == 22.0
