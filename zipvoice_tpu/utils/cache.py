"""Persistent XLA compilation cache helper.

Compiles of the 123M sampling/training programs are expensive (minutes in
remote-compile environments); every CLI enables the on-disk cache so a
program is compiled once per machine.
"""

import os

import jax

_DEFAULT = os.environ.get(
    "ZIPVOICE_TPU_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "zipvoice_tpu_xla"),
)


def enable_compilation_cache(path: str = None) -> str:
    path = path or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
