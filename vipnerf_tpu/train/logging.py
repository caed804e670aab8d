"""Training observability: TensorBoard scalars (when available) + JSONL.

Parity target: the reference logs one scalar per loss per iteration plus lr
and a wall-time text tag to TensorBoard (src/Trainer01.py:55, 266-272,
297-305). Here scalars additionally land in logs/scalars.jsonl so runs remain
inspectable without TensorBoard, and `export_plots` replaces the reference's
event-file plot export (src/Trainer01.py:412-427, demo3).
"""

import datetime
import json
from pathlib import Path
from typing import Dict, Optional


class ScalarLogger:
    def __init__(self, logs_dirpath: Path):
        self.logs_dirpath = Path(logs_dirpath)
        self.logs_dirpath.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logs_dirpath / "scalars.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.logs_dirpath.as_posix())
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, prefix: str, scalars: Dict[str, float], step: int):
        if self._tb is not None:
            now = datetime.datetime.now().strftime("%d/%m/%Y %I:%M:%S %p")
            self._tb.add_text(f"{prefix}/Time", now, step)
        for key, value in scalars.items():
            self.add_scalar(f"{prefix}/{key}", value, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def export_plots(logs_dirpath: Path, save_dirpath: Optional[Path] = None):
    """Plot every logged scalar series to png (reference save_plots,
    src/Trainer01.py:412-427, reading from scalars.jsonl instead of TB
    event files)."""
    import collections

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot

    logs_dirpath = Path(logs_dirpath)
    save_dirpath = Path(save_dirpath) if save_dirpath else logs_dirpath
    series = collections.defaultdict(list)
    jsonl = logs_dirpath / "scalars.jsonl"
    if not jsonl.exists():
        return
    for line in jsonl.read_text().splitlines():
        rec = json.loads(line)
        series[rec["tag"]].append((rec["step"], rec["value"]))
    for tag, points in series.items():
        points.sort()
        prefix, *rest = tag.split("/")
        name = "_".join(rest)
        pyplot.figure()
        pyplot.plot([p[0] for p in points], [p[1] for p in points])
        pyplot.title(tag)
        pyplot.savefig(save_dirpath / f"{prefix}_{name}.png")
        pyplot.close()
