"""Device helpers.

Equivalents of the reference's utils/CommonUtils01.py (paths relative to
/root/reference/): get_device (:15-26) maps a configured device list to a
torch device; here it maps to jax devices. move_to_device (:29-44)
recursively uploads nested dict/list structures.
"""

from typing import Any, Optional, Sequence

import jax


def backend_probe_alive(timeout: float = 90.0) -> bool:
    """True if jax backend init would not hang in this process.

    The tunneled axon TPU backend goes down for hours at a time; a bare
    ``jax.devices()`` then blocks forever. Probe init in a subprocess with
    a timeout so top-level tools (bench.py, __graft_entry__) can fall back
    to CPU instead of hanging. Returns True immediately when a backend is
    already initialized in-process (can't hang) or the process is pinned
    to the CPU platform.
    """
    import os
    import subprocess
    import sys

    try:
        if jax._src.xla_bridge._backends:  # already initialized -> safe
            return True
    except AttributeError:
        pass  # private attr may move across jax versions; fall through
        # to the subprocess probe, which never hangs this process
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def get_device(device_config: Optional[Sequence[int]] = None) -> jax.Device:
    """First configured device (the reference returns cuda:{id0} or cpu)."""
    devices = jax.devices()
    if not device_config:
        return devices[0]
    idx = device_config[0] if not isinstance(device_config, int) else device_config
    return devices[idx % len(devices)]


def move_to_device(data: Any, device: Optional[jax.Device] = None) -> Any:
    """Recursively device_put arrays in nested dicts/lists/tuples."""
    if isinstance(data, dict):
        return {k: move_to_device(v, device) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        t = type(data)
        return t(move_to_device(v, device) for v in data)
    if hasattr(data, "shape"):
        return jax.device_put(data, device)
    return data
