"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The session environment registers a remote TPU ('axon') backend via
sitecustomize and forces jax_platforms to it programmatically, so setting the
JAX_PLATFORMS env var is not enough — we must update jax.config before any
backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-bound; repeat runs are warm
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_cpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_PATH = "/root/reference"

if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    # parity tests import the reference implementation (torch CPU)
    sys.path.insert(0, REFERENCE_PATH)

try:  # the reference imports lhotse for utilities we don't need in tests
    import lhotse  # noqa: F401
except ImportError:
    import types

    _lhotse = types.ModuleType("lhotse")
    _lhotse_utils = types.ModuleType("lhotse.utils")

    def _fix_random_seed(seed):
        import random

        import numpy as _np
        import torch as _torch

        random.seed(seed)
        _np.random.seed(seed)
        _torch.manual_seed(seed)

    _lhotse_utils.fix_random_seed = _fix_random_seed
    _lhotse.utils = _lhotse_utils
    _lhotse.CutSet = None
    sys.modules["lhotse"] = _lhotse
    sys.modules["lhotse.utils"] = _lhotse_utils

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_PATH)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not available"
)
