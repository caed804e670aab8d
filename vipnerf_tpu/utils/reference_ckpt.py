"""Convert reference ViP-NeRF torch checkpoints (.tar) to this framework.

The reference saves ``Model_Iter{NNNNNN:06}.tar`` files via ``torch.save``
holding ``{iteration_num, model_state_dict, optimizer_state_dict}``
(/root/reference/src/Trainer01.py:352-366). A user migrating here brings
per-scene models trained for 50k-200k iterations; this module turns each
.tar into a ``Model_Iter{NNNNNN:06}.ckpt`` in our msgpack format
(train/checkpoints.py) so they can be used for testing, video rendering,
and even *resumed training*:

- model weights map name-for-name (``coarse_model.pts_linears.0.weight`` ->
  ``params['coarse']['pts_linears'][0]['w']``, transposed: torch Linear
  stores (out, in), we store (in, out)); a ``module.`` prefix from
  torch.nn.DataParallel (Trainer01.py:517) is stripped.
- Adam state maps moment-for-moment: torch's per-parameter
  ``exp_avg``/``exp_avg_sq``/``step`` (the parameter order of
  ``model.parameters()`` equals the state_dict key order) fill optax's
  ``ScaleByAdamState.mu``/``nu``/``count``, and the LR-schedule count is set
  to the same step, so the resumed learning rate and bias corrections match
  the reference exactly (both count conventions are "steps taken so far").

CLI (a single .tar, or a saved_models dir -> converts every Model_Iter*.tar
and leaves Model_Latest.ckpt pointing at the newest):

    python -m vipnerf_tpu.utils.reference_ckpt \
        runs/training/train0001/scene/saved_models \
        --configs runs/training/train0001/scene/Configs.json

The reverse direction also works (``--to_reference``): export our .ckpt
files back to reference .tar checkpoints, so models trained here can be
tested, rendered, or resumed by the original torch codebase.
"""

import argparse
import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------------------
# name mapping
# --------------------------------------------------------------------------

_MODULE_RENAMES = {"coarse_model": "coarse", "fine_model": "fine"}


def _torch_key_to_path(key: str) -> Tuple[Tuple[Any, ...], bool]:
    """Reference state_dict key -> (path into our params pytree, transpose?).

    e.g. 'module.coarse_model.pts_linears.0.weight'
         -> (('coarse', 'pts_linears', 0, 'w'), True)
    """
    parts = key.split(".")
    if parts[0] == "module":  # DataParallel wrap (Trainer01.py:517)
        parts = parts[1:]
    path: List[Any] = []
    for p in parts[:-1]:
        path.append(int(p) if p.isdigit() else _MODULE_RENAMES.get(p, p))
    leaf = parts[-1]
    if leaf == "weight":
        return tuple(path + ["w"]), True
    if leaf == "bias":
        return tuple(path + ["b"]), False
    raise ValueError(f"unrecognized reference parameter key: {key}")


def _assign(tree: Dict, path: Tuple, value) -> None:
    """Auto-vivifying nested assignment; int path elements become dict keys
    that `_listify` later converts into lists."""
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _listify(node):
    """Convert {0: .., 1: ..} int-keyed dicts into lists (ModuleList).

    Gaps (an index Adam never touched, e.g. a frozen layer) become empty
    dicts, which `_overlay` leaves at the template's zero moments."""
    if isinstance(node, dict):
        if node and all(isinstance(k, int) for k in node):
            return [
                _listify(node[i]) if i in node else {}
                for i in range(max(node) + 1)
            ]
        return {k: _listify(v) for k, v in node.items()}
    return node


def _to_numpy(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def convert_model_state(torch_state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference model_state_dict -> our params pytree (numpy, f32)."""
    tree: Dict[str, Any] = {}
    for key, tensor in torch_state_dict.items():
        path, transpose = _torch_key_to_path(key)
        arr = _to_numpy(tensor)
        _assign(tree, path, arr.T if transpose else arr)
    return _listify(tree)


# --------------------------------------------------------------------------
# optimizer state
# --------------------------------------------------------------------------

def convert_adam_moments(
    torch_opt_state: Dict[str, Any], model_keys: List[str]
) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Reference Adam optimizer_state_dict -> (mu pytree, nu pytree, step).

    torch.optim.Adam indexes parameters positionally in ``parameters()``
    order, which for a Module equals its state_dict key order — ``model_keys``
    provides that order. Missing indices (a parameter Adam never touched)
    become zero moments, matching a fresh optax init for that leaf.
    """
    state = torch_opt_state.get("state", {})
    mu_sd: Dict[str, Any] = {}
    nu_sd: Dict[str, Any] = {}
    step = 0
    for idx, key in enumerate(model_keys):
        entry = state.get(idx, state.get(str(idx)))
        if entry is None:
            continue
        mu_sd[key] = entry["exp_avg"]
        nu_sd[key] = entry["exp_avg_sq"]
        step = max(step, int(entry["step"]))
    mu = convert_model_state(mu_sd) if mu_sd else {}
    nu = convert_model_state(nu_sd) if nu_sd else {}
    return mu, nu, step


def _overlay(template, patch):
    """Fill `template` (zeros from tx.init) with `patch` values where given.

    Leaf shapes must match the template — a moment tensor from a mismatched
    optimizer_state_dict fails loudly here instead of surfacing later as a
    cryptic jit error at resume time."""
    if patch is None or (isinstance(patch, dict) and not patch
                         and not isinstance(template, dict)):
        return template
    if isinstance(template, dict):
        if not isinstance(patch, dict):
            raise ValueError(
                f"optimizer-state structure mismatch: expected mapping for "
                f"{sorted(template)}, got {type(patch).__name__}"
            )
        return {k: _overlay(v, patch.get(k)) for k, v in template.items()}
    if isinstance(template, list):
        patch = patch or []
        return [
            _overlay(v, patch[i] if i < len(patch) else None)
            for i, v in enumerate(template)
        ]
    arr = np.asarray(patch, dtype=np.float32)
    if hasattr(template, "shape") and arr.shape != tuple(template.shape):
        raise ValueError(
            f"optimizer-state shape mismatch: moment {arr.shape} vs "
            f"parameter {tuple(template.shape)}"
        )
    return arr


def build_opt_state(tx, params, mu, nu, step: int):
    """tx.init(params) with Adam moments + all schedule counts patched in."""
    import jax.numpy as jnp
    import optax

    count = jnp.asarray(step, jnp.int32)

    def patch(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=count,
                mu=_overlay(node.mu, mu),
                nu=_overlay(node.nu, nu),
            )
        if isinstance(node, optax.ScaleByScheduleState):
            return node._replace(count=count)
        if hasattr(node, "_fields"):  # other namedtuple states
            return type(node)(*(patch(getattr(node, f)) for f in node._fields))
        if isinstance(node, tuple):
            return tuple(patch(v) for v in node)
        if isinstance(node, list):
            return [patch(v) for v in node]
        return node

    return patch(tx.init(params))


# --------------------------------------------------------------------------
# reverse direction: our .ckpt -> reference .tar
# --------------------------------------------------------------------------

def _path_to_torch_key(path: List[Any]) -> str:
    renames = {v: k for k, v in _MODULE_RENAMES.items()}
    parts = [str(renames.get(p, p)) for p in path[:-1]]
    parts.append({"w": "weight", "b": "bias"}[path[-1]])
    return ".".join(parts)


def _flatten_params(tree, prefix=()):
    """Yield (path, leaf) pairs from a params pytree."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten_params(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_params(v, prefix + (i,))
    else:
        yield prefix, tree


# torch.nn.Module registration order of the reference MLP's submodules
# (VipNeRF01.py:472-491) — this fixes the positional parameter indices
# torch.optim.Adam uses in its state dict.
_TORCH_MODULE_ORDER = {
    "pts_linears": 0,
    "views_linears": 1,
    "pts_output_linear": 2,
    "feature_linear": 3,
    "views_output_linear": 4,
}


def _torch_param_rank(path: Tuple) -> Tuple:
    """Sort key putting flattened (path, leaf) pairs into the reference's
    ``model.parameters()`` order: coarse before fine (VipNeRF01.py:22-25),
    submodules in registration order, ModuleList by index, weight before
    bias (torch.nn.Linear registers weight first)."""
    model = 0 if path[0] == "coarse" else 1
    module = _TORCH_MODULE_ORDER.get(path[1], len(_TORCH_MODULE_ORDER))
    index = path[2] if len(path) > 3 else -1
    leaf = 0 if path[-1] == "w" else 1
    return (model, module, index, leaf)


def export_checkpoint(
    ckpt_path: Path,
    configs: Dict[str, Any],
    output_path: Optional[Path] = None,
) -> Path:
    """Our Model_Iter*.ckpt -> a reference-loadable torch .tar.

    The inverse of convert_checkpoint: weights transpose back to torch
    Linear (out, in) layout under the reference's module names (with the
    ``module.`` prefix both reference load paths require — they
    DataParallel-wrap before load_state_dict, Trainer01.py:517 + :376,
    Tester01.py:42 + :48), and the optax Adam state fills torch's
    per-parameter exp_avg/exp_avg_sq/step (positional indices in
    parameters() order) so the reference can both test AND resume
    training from it (Trainer01.py:368-381).
    """
    import torch

    import flax.serialization
    import jax
    import optax

    from vipnerf_tpu.models import get_model
    from vipnerf_tpu.train.step import make_optimizer

    ckpt_path = Path(ckpt_path)
    blob = ckpt_path.read_bytes()
    state = flax.serialization.msgpack_restore(blob)
    iteration_num = int(state["iteration_num"])

    init_fn, _ = get_model(configs)
    template = init_fn(jax.random.PRNGKey(0), configs)
    params = flax.serialization.from_state_dict(
        template, state["model_state_dict"]
    )
    tx = make_optimizer(configs)
    opt_state = flax.serialization.from_state_dict(
        tx.init(template), state["optimizer_state_dict"]
    )

    def leaves_in_order(tree):
        pairs = sorted(_flatten_params(tree), key=lambda p: _torch_param_rank(p[0]))
        out = {}
        for path, leaf in pairs:
            key = _path_to_torch_key(list(path))
            arr = np.asarray(leaf, np.float32)
            out[key] = arr.T.copy() if key.endswith("weight") else arr
        return out

    param_sd = leaves_in_order(params)
    # np.array copies: torch.from_numpy refuses to alias read-only views
    model_sd = {
        f"module.{k}": torch.from_numpy(np.array(v, dtype=np.float32))
        for k, v in param_sd.items()
    }

    is_adam = lambda x: isinstance(x, optax.ScaleByAdamState)  # noqa: E731
    adam = next(
        filter(is_adam, jax.tree_util.tree_leaves(opt_state, is_leaf=is_adam)),
        None,
    )
    opt_sd = {"state": {}, "param_groups": []}
    if adam is not None:
        mu_sd = leaves_in_order(adam.mu)
        nu_sd = leaves_in_order(adam.nu)
        step = float(adam.count)
        for idx, key in enumerate(param_sd):
            opt_sd["state"][idx] = {
                # a fresh tensor per entry: torch.optim.Adam increments
                # `step` in-place, so sharing one tensor would advance it
                # once per parameter
                "step": torch.tensor(step),
                "exp_avg": torch.from_numpy(
                    np.array(mu_sd[key], dtype=np.float32)
                ),
                "exp_avg_sq": torch.from_numpy(
                    np.array(nu_sd[key], dtype=np.float32)
                ),
            }
        opt_cfg = configs.get("optimizer", {})
        opt_sd["param_groups"] = [{
            "lr": float(opt_cfg.get("lr_initial", 5e-4)),
            "betas": (opt_cfg.get("beta1", 0.9), opt_cfg.get("beta2", 0.999)),
            "eps": 1e-8, "weight_decay": 0, "amsgrad": False,
            "maximize": False, "foreach": None, "capturable": False,
            "differentiable": False, "fused": None,
            "params": list(range(len(model_sd))),
        }]

    if output_path is None:
        output_path = ckpt_path.resolve().with_suffix(".tar")
    torch.save(
        {
            "iteration_num": iteration_num,
            "model_state_dict": model_sd,
            "optimizer_state_dict": opt_sd,
        },
        output_path,
    )
    return Path(output_path)


def export_run(
    path: Path,
    configs: Optional[Dict[str, Any]] = None,
    output_dir: Optional[Path] = None,
) -> List[Path]:
    """Export a single .ckpt, or every Model_Iter*.ckpt in a saved_models
    dir, to reference .tar files (Model_Latest.tar symlink on the newest)."""
    path = Path(path)
    if configs is None:
        configs = _find_configs(path)
    if path.is_dir():
        ckpts = sorted(
            (p for p in path.glob("Model_Iter*.ckpt") if not p.is_symlink()),
            key=lambda p: int(p.stem.replace("Model_Iter", "")),
        )
        if not ckpts:
            raise FileNotFoundError(f"no Model_Iter*.ckpt under {path}")
    else:
        ckpts = [path]
    written = []
    for c in ckpts:
        out = None
        if output_dir is not None:
            out = Path(output_dir) / c.resolve().with_suffix(".tar").name
        written.append(export_checkpoint(c, configs, out))
    if len(written) >= 1 and written[-1].parent == written[0].parent:
        latest = written[-1].parent / "Model_Latest.tar"
        new_it = int(written[-1].stem.replace("Model_Iter", ""))
        cur_it = -1
        if latest.is_symlink() or latest.exists():
            try:
                cur_it = int(latest.resolve().stem.replace("Model_Iter", ""))
            except (ValueError, OSError):
                pass  # unparseable target: replace
        if new_it >= cur_it:
            # never roll Latest back to an older iteration (single-file mode
            # in a dir that already has newer exports)
            if latest.is_symlink() or latest.exists():
                latest.unlink()
            latest.symlink_to(written[-1].name)
    return written


# --------------------------------------------------------------------------
# checkpoint conversion
# --------------------------------------------------------------------------

def convert_checkpoint(
    tar_path: Path,
    configs: Dict[str, Any],
    output_dir: Optional[Path] = None,
    params_only: bool = False,
    _template=None,
    _tx=None,
) -> Path:
    """Convert one reference .tar -> Model_Iter{NNNNNN:06}.ckpt (+ Latest).

    `configs` must contain the run's ``model`` and ``optimizer`` sections
    (the reference run's Configs.json works as-is). The converted params are
    structure-checked against a fresh init for those configs, so a
    mismatched Configs.json fails loudly instead of producing an unloadable
    checkpoint. With ``params_only`` the optimizer restarts fresh (enough
    for testing/videos; training resumes with reset moments).
    `_template`/`_tx` let convert_run reuse the (config-identical) init
    template and optimizer across a directory of checkpoints.
    """
    import torch

    import jax

    from vipnerf_tpu.models import get_model
    from vipnerf_tpu.train.checkpoints import save_checkpoint
    from vipnerf_tpu.train.step import make_optimizer

    tar_path = Path(tar_path)
    ckpt = torch.load(tar_path, map_location="cpu")
    iteration_num = int(ckpt["iteration_num"])
    model_sd = ckpt["model_state_dict"]
    params = convert_model_state(model_sd)

    if _template is None:
        init_fn, _ = get_model(configs)
        _template = init_fn(jax.random.PRNGKey(0), configs)
    template = _template
    t_ours = jax.tree_util.tree_structure(template)
    t_conv = jax.tree_util.tree_structure(params)
    if t_ours != t_conv:
        raise ValueError(
            f"converted params do not match the model built from configs:\n"
            f"  configs model -> {t_ours}\n  checkpoint    -> {t_conv}"
        )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(template),
        jax.tree_util.tree_leaves_with_path(params),
    ):
        if a.shape != b.shape:
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(kp)}: "
                f"configs {a.shape} vs checkpoint {b.shape}"
            )

    tx = _tx if _tx is not None else make_optimizer(configs)
    if params_only:
        opt_state = tx.init(params)
    else:
        keys = [k for k in model_sd if k.endswith(("weight", "bias"))]
        mu, nu, step = convert_adam_moments(
            ckpt.get("optimizer_state_dict") or {}, keys
        )
        opt_state = build_opt_state(tx, params, mu, nu, step or iteration_num)

    if output_dir is None:
        output_dir = tar_path.parent
    return save_checkpoint(Path(output_dir), iteration_num, params, opt_state)


def convert_run(
    path: Path,
    configs: Optional[Dict[str, Any]] = None,
    output_dir: Optional[Path] = None,
    params_only: bool = False,
) -> List[Path]:
    """Convert a single .tar, or every Model_Iter*.tar in a saved_models dir
    (ascending, so Model_Latest.ckpt ends on the newest iteration)."""
    path = Path(path)
    if configs is None:
        configs = _find_configs(path)
    if path.is_dir():
        # numeric sort: lexicographic order breaks past 999999 iterations
        # (f'{:06}' does not truncate wider numbers)
        tars = sorted(
            (p for p in path.glob("Model_Iter*.tar") if not p.is_symlink()),
            key=lambda p: int(p.stem.replace("Model_Iter", "")),
        )
        if not tars:
            raise FileNotFoundError(f"no Model_Iter*.tar under {path}")
    else:
        tars = [path]

    import jax

    from vipnerf_tpu.models import get_model
    from vipnerf_tpu.train.step import make_optimizer

    init_fn, _ = get_model(configs)
    template = init_fn(jax.random.PRNGKey(0), configs)
    tx = make_optimizer(configs)
    return [
        convert_checkpoint(
            t, configs, output_dir, params_only, _template=template, _tx=tx
        )
        for t in tars
    ]


def _find_configs(path: Path) -> Dict[str, Any]:
    """Locate the run's Configs.json next to / above a checkpoint path
    (reference layout: .../{scene}/saved_models/Model_Iter*.tar with
    .../{scene}/Configs.json)."""
    path = Path(path)
    for parent in ([path] if path.is_dir() else []) + list(path.parents):
        candidate = parent / "Configs.json"
        if candidate.exists():
            return json.loads(candidate.read_text())
    raise FileNotFoundError(
        f"no Configs.json found above {path}; pass --configs explicitly"
    )


def main():
    # Conversion is pure host-side numpy; jax is only used to build the
    # params/optimizer templates. Run on the CPU backend so the CLI never
    # waits on (or occupies) an accelerator. Must happen before backend
    # init; harmless no-op if a backend is somehow already up.
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - backend already initialized
        pass
    parser = argparse.ArgumentParser(
        description="Convert reference ViP-NeRF torch checkpoints (.tar) "
        "to this framework's .ckpt format"
    )
    parser.add_argument(
        "path",
        help="a Model_Iter*.tar file, or a saved_models directory "
        "(converts every iteration checkpoint in it)",
    )
    parser.add_argument(
        "--configs",
        help="path to the run's Configs.json (default: auto-discovered "
        "next to the checkpoint, the reference run layout)",
    )
    parser.add_argument(
        "--output_dir",
        help="where to write the .ckpt files (default: alongside the .tar)",
    )
    parser.add_argument(
        "--params_only",
        action="store_true",
        help="skip optimizer-state conversion (fresh Adam moments)",
    )
    parser.add_argument(
        "--to_reference",
        action="store_true",
        help="reverse direction: export our .ckpt file(s) to reference "
        ".tar checkpoints the torch codebase can test and resume from",
    )
    args = parser.parse_args()
    configs = (
        json.loads(Path(args.configs).read_text()) if args.configs else None
    )
    output_dir = Path(args.output_dir) if args.output_dir else None
    if args.to_reference:
        written = export_run(args.path, configs, output_dir)
    else:
        written = convert_run(
            args.path, configs, output_dir, params_only=args.params_only
        )
    for p in written:
        print(p)


if __name__ == "__main__":
    main()
