"""Config persistence with resume-merge semantics.

Parity target: src/Trainer01.py:440-488 (paths relative to /root/reference/):
on resume, the saved Configs.json's seed and missing keys are inherited,
scene lists are merged, num_iterations may be extended, and any remaining
mismatch is reported (the reference prints a DeepDiff; deepdiff isn't in this
environment, so a minimal recursive diff is used).
"""

import json
from pathlib import Path
from typing import Any, Dict, Optional

import simplejson


def dict_diff(old: Any, new: Any, prefix: str = "") -> list:
    """Minimal recursive diff: list of 'path: old -> new' strings."""
    diffs = []
    if isinstance(old, dict) and isinstance(new, dict):
        for key in sorted(set(old) | set(new)):
            p = f"{prefix}.{key}" if prefix else str(key)
            if key not in old:
                diffs.append(f"{p}: <absent> -> {new[key]!r}")
            elif key not in new:
                diffs.append(f"{p}: {old[key]!r} -> <absent>")
            else:
                diffs.extend(dict_diff(old[key], new[key], p))
    elif old != new:
        diffs.append(f"{prefix}: {old!r} -> {new!r}")
    return diffs


def save_configs(
    output_dirpath: Path, configs: Dict[str, Any], filename: str = "Configs.json"
) -> Dict[str, Any]:
    """Persist run configs, merging with an existing file on resume
    (reference save_configs :440-473).

    Like the reference, the merge happens on the LIVE dict — resuming with a
    minimal config (e.g. just ``{train_num, resume_training}``, the reference's
    demo2 contract, NerfLlffTrainerTester01.py:933-940) inherits everything
    else from the saved Configs.json. The merged dict is both mutated in place
    and returned; callers must consume the returned dict.
    """
    configs_path = Path(output_dirpath) / filename
    if configs_path.exists():
        with open(configs_path) as f:
            old_configs = json.load(f)
        configs["seed"] = old_configs.get("seed", configs.get("seed"))
        for key in old_configs:
            if key not in configs:
                configs[key] = old_configs[key]
        scene_id_key = None
        for candidate in ("scene_nums", "scene_names", "scene_ids"):
            if candidate in old_configs.get("data_loader", {}):
                scene_id_key = candidate
                break
        if scene_id_key is not None:
            old_ids = old_configs["data_loader"].get(scene_id_key, [])
            new_ids = configs["data_loader"].get(scene_id_key, [])
            merged = sorted(set(old_ids) | set(new_ids))
            if merged:
                configs["data_loader"][scene_id_key] = merged
                old_configs["data_loader"][scene_id_key] = merged
        if configs.get("num_iterations", 0) > old_configs.get("num_iterations", 0):
            old_configs["num_iterations"] = configs["num_iterations"]
        if "device" in configs:
            old_configs["device"] = configs["device"]
        mismatch = {
            k: v
            for k, v in configs.items()
            if k not in ("root_dirpath", "output_dirpath")
        }
        if mismatch != old_configs:
            print(
                "Configs mismatch while resuming training: "
                + "; ".join(dict_diff(old_configs, mismatch))
            )
    to_write = {
        k: v for k, v in configs.items() if k not in ("root_dirpath", "output_dirpath")
    }
    with open(configs_path, "w") as f:
        simplejson.dump(to_write, f, indent=4, default=str)
    return configs


def save_model_configs(
    output_dirpath: Path, configs: Dict[str, Any], filename: str = "ModelConfigs.json"
):
    """Persist model configs, warning on drift (reference :476-488)."""
    configs_path = Path(output_dirpath) / filename
    if configs_path.exists():
        with open(configs_path) as f:
            old_configs = json.load(f)
        if configs != old_configs:
            print(
                "Model configs mismatch while resuming training: "
                + "; ".join(dict_diff(old_configs, configs))
            )
    with open(configs_path, "w") as f:
        simplejson.dump(configs, f, indent=4, default=str)


def read_configs(path: Path) -> Dict[str, Any]:
    with open(path) as f:
        return json.load(f)


def init_seeds(seed: Optional[int] = 0):
    """Pin host-side RNGs (reference init_seeds :430-437). Device-side
    randomness is keyed explicitly via jax.random."""
    import os
    import random

    import numpy as np

    if seed is None:
        return
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
