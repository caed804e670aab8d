"""Scalar logging + plot export (the reference's demo3 path)."""

import json

import numpy as np

from vipnerf_tpu.train.logging import ScalarLogger, export_plots


class TestScalarLogging:
    def test_jsonl_roundtrip_and_plots(self, tmp_path):
        logs = tmp_path / "logs"
        logger = ScalarLogger(logs)
        for step in range(1, 21):
            logger.add_scalar("train/TotalLoss", 1.0 / step, step)
            logger.add_scalar("train/lr", 5e-4, step)
        logger.add_scalars("validation/val_images", {"MSE01": 0.5}, 20)
        logger.flush()

        rows = [
            json.loads(line)
            for line in (logs / "scalars.jsonl").read_text().splitlines()
        ]
        total = [r for r in rows if r["tag"] == "train/TotalLoss"]
        assert len(total) == 20
        assert total[-1]["value"] == 1.0 / 20
        assert any(r["tag"] == "validation/val_images/MSE01" for r in rows)

        # demo3: export plots from the jsonl (reference save_plots,
        # Trainer01.py:412-427)
        out = tmp_path / "plots"
        out.mkdir()
        export_plots(logs, out)
        pngs = sorted(p.name for p in out.glob("*.png"))
        assert "train_TotalLoss.png" in pngs
        assert "train_lr.png" in pngs
        assert any(name.startswith("validation_") for name in pngs)

    def test_export_plots_missing_jsonl_is_noop(self, tmp_path):
        export_plots(tmp_path)  # must not raise
        assert list(tmp_path.glob("*.png")) == []
