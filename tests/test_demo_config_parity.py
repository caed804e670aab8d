"""Demo config parity: our app demos must build the reference's config dicts.

The reference defines its run configs inline in each demo function
(e.g. /root/reference/src/NerfLlffTrainerTester01.py:228-347). This test
AST-extracts those dict literals (without executing the reference) and
compares them against the configs our demo functions actually pass to
start_training/start_testing (captured by stubbing the app methods), for
every dataset x demo1a..demo1f.

Deliberate, documented differences are skipped explicitly:
- 'trainer'/'Tester' version strings (f-strings naming torch modules)
- 'device' (reference: CUDA ids for DataParallel; here: mesh device list)
- 'model_name' extension (.tar torch vs .ckpt msgpack) — stems must match
- 'mixed_precision_training' (declared but never read by the reference —
  grep confirms; here it reflects the real bf16 knob)
- 'validation_chunk_size' (reference 64k; here 16k — a 64k retraw+losses
  tile hits the axon backend's pathological-compile mode and smaller tiles
  also render faster, see apps/configs.py and bench.py)
- iter_weights keys (ints in the reference, JSON-safe strings here)
Everything else — batching, ray counts, sampling, MLP shapes, loss stack,
optimizer, intervals, seeds, scene lists — must match exactly.
"""

import ast
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

_SKIP = object()

_REF_FILES = {
    "nerf_llff": "NerfLlffTrainerTester01.py",
    "real_estate": "RealEstateTrainerTester01.py",
    "dtu": "DtuTrainerTester01.py",
}
_DEMOS = ["demo1a", "demo1b", "demo1c", "demo1d", "demo1e", "demo1f"]

# (tuple-path suffix) -> reason, for deliberate differences
_SKIP_KEYS = {
    "trainer": "version string",
    "Tester": "version string",
    "device": "CUDA ids vs mesh devices",
    "mixed_precision_training": "declared but never read by the reference",
    "validation_chunk_size": "64k tile hits the backend's pathological "
    "compile; 16k measured faster (apps/configs.py)",
}


def _literal(node, env):
    """Best-effort literal evaluation; _SKIP for anything non-literal."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Dict):
        out = {}
        for k, v in zip(node.keys, node.values):
            key = _literal(k, env)
            val = _literal(v, env)
            if key is _SKIP:
                return _SKIP
            out[key] = val
        return out
    if isinstance(node, (ast.List, ast.Tuple)):
        vals = [_literal(e, env) for e in node.elts]
        return _SKIP if any(v is _SKIP for v in vals) else vals
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        v = _literal(node.operand, env)
        return _SKIP if v is _SKIP else -v
    if isinstance(node, ast.BinOp) and isinstance(
        node.op, (ast.Mult, ast.Add, ast.Sub)
    ):
        a = _literal(node.left, env)
        b = _literal(node.right, env)
        if a is _SKIP or b is _SKIP:
            return _SKIP
        if isinstance(node.op, ast.Mult):
            return a * b
        if isinstance(node.op, ast.Add):
            return a + b
        return a - b
    if isinstance(node, ast.Name):
        return env.get(node.id, _SKIP)
    return _SKIP  # JoinedStr, Subscript, calls, ...


def extract_reference_configs(dataset: str, demo: str):
    """(train_configs, test_configs) literals from the reference demo fn."""
    src = (REFERENCE / "src" / _REF_FILES[dataset]).read_text()
    tree = ast.parse(src)
    fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == demo
    )
    env, found = {}, {}
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            tgt = node.targets[0]
            if isinstance(tgt, ast.Name):
                if tgt.id in ("train_configs", "test_configs"):
                    found.setdefault(tgt.id, _literal(node.value, env))
                else:
                    val = _literal(node.value, env)
                    if val is not _SKIP:
                        env[tgt.id] = val
        # per-scene loops bind the loop var to the first scene
        if isinstance(node, ast.For) and isinstance(node.target, ast.Name):
            seq = _literal(node.iter, env)
            if seq is not _SKIP and isinstance(seq, list) and seq:
                env[node.target.id] = seq[0]
    assert "train_configs" in found, f"{dataset}/{demo}: no train_configs"
    assert "test_configs" in found, f"{dataset}/{demo}: no test_configs"
    return found["train_configs"], found["test_configs"]


def capture_our_configs(dataset: str, demo: str):
    """(train_configs, test_configs) our demo passes to the app methods."""
    import importlib

    mod = importlib.import_module(f"vipnerf_tpu.apps.{dataset}")

    captured = {}

    class _Stop(Exception):
        pass

    def grab_train(cfg, *a, **k):
        captured["train"] = cfg

    def grab_test(cfg, *a, **k):
        captured["test"] = cfg
        raise _Stop  # first scene is enough; stop before videos/QA

    mp = pytest.MonkeyPatch()
    mp.setattr(mod.app, "start_training", grab_train)
    mp.setattr(mod.app, "start_testing", grab_test)
    mp.setattr(mod.app, "start_testing_videos", lambda *a, **k: None)
    mp.setattr(mod.app, "start_testing_static_videos", lambda *a, **k: None)
    try:
        getattr(mod, demo)()
    except _Stop:
        pass
    finally:
        mp.undo()
    return captured["train"], captured["test"]


def _diff(ref, ours, path=()):
    """Mismatches between the reference literal and our config."""
    problems = []
    key = path[-1] if path else None
    if key in _SKIP_KEYS or ref is _SKIP:
        return problems
    if key == "model_name":
        if Path(str(ref)).stem != Path(str(ours)).stem:
            problems.append(f"{'.'.join(map(str, path))}: {ref!r} != {ours!r}")
        return problems
    if isinstance(ref, dict):
        if not isinstance(ours, dict):
            return [f"{'.'.join(map(str, path))}: dict vs {type(ours).__name__}"]
        ours_norm = {str(k): v for k, v in ours.items()}
        for k, v in ref.items():
            k_norm = str(k)
            if k in _SKIP_KEYS or v is _SKIP:
                continue
            if k_norm not in ours_norm:
                problems.append(f"{'.'.join(map(str, path + (k,)))}: missing")
                continue
            problems += _diff(v, ours_norm[k_norm], path + (k,))
        return problems
    if isinstance(ref, list):
        if not isinstance(ours, list) or len(ref) != len(ours):
            return [f"{'.'.join(map(str, path))}: {ref!r} != {ours!r}"]
        for i, (a, b) in enumerate(zip(ref, ours)):
            problems += _diff(a, b, path + (i,))
        return problems
    if ref != ours:
        problems.append(f"{'.'.join(map(str, path))}: {ref!r} != {ours!r}")
    return problems


@pytest.mark.parametrize("dataset", list(_REF_FILES))
@pytest.mark.parametrize("demo", _DEMOS)
def test_demo_config_matches_reference(dataset, demo):
    ref_train, ref_test = extract_reference_configs(dataset, demo)
    our_train, our_test = capture_our_configs(dataset, demo)
    problems = _diff(ref_train, our_train, ("train",))
    problems += _diff(ref_test, our_test, ("test",))
    assert not problems, (
        f"{dataset}/{demo} config drift vs the reference:\n  "
        + "\n  ".join(problems)
    )
