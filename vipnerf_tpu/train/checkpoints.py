"""Checkpointing with the reference's on-disk naming contract.

Parity target (src/Trainer01.py:352-381, paths relative to /root/reference/):
- saved_models/Model_Iter{NNNNNN:06}.ckpt containing
  {iteration_num, model_state_dict, optimizer_state_dict}
- saved_models/Model_Latest.ckpt as a *relative* symlink to the newest file
- load restores params + optimizer state + iteration.

Implementation: pytrees are converted with flax.serialization.to_state_dict
(namedtuple optimizer states become plain dicts) and written as a single
msgpack file — crash-safe via write-to-temp + atomic rename.
"""

import os
from pathlib import Path
from typing import Any, Optional, Tuple

import flax.serialization
import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    save_dir: Path,
    iteration_num: int,
    params: Any,
    opt_state: Any,
) -> Path:
    """Write Model_Iter{iter:06}.ckpt + refresh the Model_Latest symlink."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    state = {
        "iteration_num": iteration_num,
        "model_state_dict": flax.serialization.to_state_dict(_to_numpy(params)),
        "optimizer_state_dict": flax.serialization.to_state_dict(
            _to_numpy(opt_state)
        ),
    }
    blob = flax.serialization.msgpack_serialize(state)
    path = save_dir / f"Model_Iter{iteration_num:06}.ckpt"
    tmp = path.with_suffix(".ckpt.tmp")
    tmp.write_bytes(blob)
    os.replace(tmp, path)

    update_latest_symlink(save_dir, path)
    return path


def update_latest_symlink(save_dir: Path, path: Path) -> None:
    """Point Model_Latest.ckpt at `path` — unless it already points at a
    NEWER iteration (converting/saving an older checkpoint into a dir, e.g.
    `reference_ckpt` single-file mode, must not silently roll Latest back).
    Relative symlink as in the reference (Trainer01.py:361-365)."""
    latest = Path(save_dir) / "Model_Latest.ckpt"
    if latest.is_symlink() or latest.exists():
        # exists() follows symlinks: a dangling Latest (its target was
        # deleted, e.g. a manual rollback) must be replaced no matter what
        # iteration its target NAME parses to.
        if latest.exists():
            try:
                if checkpoint_iteration(latest) > checkpoint_iteration(path):
                    return
            except (ValueError, OSError):
                pass  # unparseable Latest: replace it
        latest.unlink()
    latest.symlink_to(Path(path).name)


def load_checkpoint(
    path: Path, params_template: Any, opt_state_template: Any
) -> Tuple[int, Any, Any]:
    """Restore (iteration_num, params, opt_state) into the given templates."""
    blob = Path(path).read_bytes()
    state = flax.serialization.msgpack_restore(blob)
    params = flax.serialization.from_state_dict(
        params_template, state["model_state_dict"]
    )
    opt_state = flax.serialization.from_state_dict(
        opt_state_template, state["optimizer_state_dict"]
    )
    return int(state["iteration_num"]), params, opt_state


def latest_checkpoint(save_dir: Path) -> Optional[Path]:
    latest = Path(save_dir) / "Model_Latest.ckpt"
    if latest.exists():
        return latest
    # numeric sort: lexicographic order breaks past 999999 iterations
    candidates = sorted(
        Path(save_dir).glob("Model_Iter*.ckpt"),
        key=lambda p: int(p.stem.replace("Model_Iter", "")),
    )
    return candidates[-1] if candidates else None


def checkpoint_iteration(path: Path) -> int:
    """Iteration number of a checkpoint file (resolves Model_Latest)."""
    name = Path(path).resolve().stem  # Model_Iter{NNNNNN}
    return int(name.replace("Model_Iter", ""))
