"""Run provenance + device-memory observability.

The reference stamps env/git info into saved params
(reference zipvoice/utils/common.py:569-582) and logs the CUDA memory
high-water mark during training (train_zipvoice.py:578-581).  TPU-native:
a JSON provenance blob written into the exp dir and embedded in
checkpoint extras, plus ``device_memory_stats`` reading the XLA
allocator's peak-bytes counters (zero-cost; absent on backends that don't
expose them).
"""

import getpass
import json
import os
import platform
import socket
import subprocess
import sys
import time
from typing import Dict, Optional


def collect_provenance(extra: Optional[Dict] = None) -> Dict:
    info = {
        "argv": sys.argv,
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "hostname": socket.gethostname(),
        "user": getpass.getuser(),
        "cwd": os.getcwd(),
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        "env": {
            k: v for k, v in os.environ.items()
            if k.startswith(("JAX_", "XLA_", "ZIPVOICE_", "LIBTPU"))
        },
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["backend"] = jax.default_backend()
        info["device_count"] = jax.device_count()
        info["process_index"] = jax.process_index()
    except Exception:  # noqa: BLE001
        pass
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
            capture_output=True, text=True, timeout=5,
        ).stdout.strip()
        if sha:
            info["git_sha"] = sha
    except Exception:  # noqa: BLE001
        pass
    if extra:
        info.update(extra)
    return info


def write_provenance(exp_dir, extra: Optional[Dict] = None) -> Dict:
    info = collect_provenance(extra)
    try:
        path = os.path.join(str(exp_dir), "env.json")
        with open(path, "w") as f:
            json.dump(info, f, indent=2, default=str)
    except OSError:
        pass
    return info


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Peak/current device memory of the first local device, if the
    backend exposes allocator stats (the CUDA high-water analog)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return None
        keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                "largest_alloc_size")
        return {k: int(stats[k]) for k in keep if k in stats}
    except Exception:  # noqa: BLE001
        return None
