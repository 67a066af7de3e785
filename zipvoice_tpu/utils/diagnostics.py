"""Diagnostics & profiling.

Replaces the reference's forward/backward-hook machinery
(zipvoice/utils/diagnostics.py: per-module tensor stats;
zipvoice/utils/hooks.py: inf/NaN checks) with functional equivalents:

- ``collect_module_stats``: runs a flax apply with
  ``capture_intermediates=True`` and reports per-module abs/rms/min/max
  percentiles of every intermediate output;
- ``find_nonfinite``: walks intermediates/grads for inf/NaN (the
  ``--inf-check`` analogue);
- ``profile``: context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace (the TPU answer to the reference's wall-clock
  RTF logging, SURVEY.md §5).
"""

import contextlib
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


_PCTS = (0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100)


def _stats(x: np.ndarray) -> Dict[str, float]:
    x = np.asarray(x, np.float32).ravel()
    if x.size == 0:
        return {}
    ax = np.abs(x)
    return {
        "shape": None,
        "mean": float(x.mean()),
        "rms": float(np.sqrt(np.mean(x * x))),
        "abs_p50": float(np.percentile(ax, 50)),
        "abs_p95": float(np.percentile(ax, 95)),
        "max": float(x.max()),
        "min": float(x.min()),
        "frac_pos": float((x > 0).mean()),
    }


def dimwise_stats(x: np.ndarray, max_dim_size: int = 2048) -> Dict[int, Dict]:
    """Per-dimension statistics in the reference's TensorDiagnostic style
    (reference diagnostics.py:29-400): for each axis, reduce every OTHER
    axis to get one value per index, then report the [0,10,...,100]
    percentiles across indices of
      - mean |x|            ("abs")
      - positive fraction   ("positive")
      - rms                 ("rms")
      - mean value          ("value")
    plus, for the trailing (channel) axis, the eigenvalue percentiles of
    the feature covariance ("eigs", reference diagnostics.py:184-220) when
    the axis is small enough.
    """
    x = np.asarray(x, np.float32)
    out: Dict[int, Dict] = {}
    for d in range(x.ndim):
        if x.shape[d] < 2 or x.shape[d] > max_dim_size:
            continue
        other = tuple(i for i in range(x.ndim) if i != d)
        ax = np.abs(x)
        stats = {
            "size": x.shape[d],
            "abs": np.percentile(ax.mean(axis=other), _PCTS),
            "positive": np.percentile((x > 0).mean(axis=other), _PCTS),
            "rms": np.percentile(
                np.sqrt((x * x).mean(axis=other)), _PCTS
            ),
            "value": np.percentile(x.mean(axis=other), _PCTS),
        }
        if d == x.ndim - 1 and x.ndim >= 2 and x.shape[d] <= 512:
            flat = x.reshape(-1, x.shape[d])
            if flat.shape[0] >= 2:
                cov = np.cov(flat, rowvar=False)
                eigs = np.linalg.eigvalsh(np.atleast_2d(cov))
                stats["eigs"] = np.percentile(eigs, _PCTS)
        out[d] = stats
    return out


def _fmt_pcts(v) -> str:
    return "[" + " ".join(f"{float(x):.2g}" for x in v) + "]"


def collect_tree_stats(
    tree: Any, dimwise: bool = True
) -> Dict[str, Dict]:
    """Dim-wise stats for every array leaf of a pytree — used on params and
    grads (the reference attaches diagnostics to parameters and their
    .grad, diagnostics.py:442-570)."""
    out: Dict[str, Dict] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if not hasattr(leaf, "shape"):
            continue
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        s = _stats(arr)
        s["shape"] = tuple(arr.shape)
        if dimwise:
            s["dims"] = dimwise_stats(arr)
        out[name] = s
    return out


def collect_module_stats(
    model, variables, *args, method=None, **kwargs
) -> Dict[str, Dict[str, float]]:
    """Run a forward capturing every module's output and return stats
    (the --print-diagnostics analogue, reference diagnostics.py:570+)."""
    out, state = model.apply(
        variables, *args, method=method, capture_intermediates=True, **kwargs
    )
    stats: Dict[str, Dict[str, float]] = {}

    flat = jax.tree_util.tree_flatten_with_path(
        state.get("intermediates", {})
    )[0]
    for path, leaf in flat:
        if not hasattr(leaf, "shape"):
            continue
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        s = _stats(arr)
        s["shape"] = tuple(arr.shape)
        s["dims"] = dimwise_stats(arr)
        if _looks_like_attention(name, arr):
            # attention-entropy diagnostic (reference zipformer.py:
            # 1299-1322 randomly logs it at eval): mean over rows of
            # -sum(w log w), in bits of effective support
            w = np.asarray(arr, np.float32)
            ent = -np.sum(w * np.log(np.clip(w, 1e-20, None)), axis=-1)
            s["attn_entropy_mean"] = float(ent.mean())
            s["attn_entropy_p95"] = float(np.percentile(ent, 95))
        stats[name] = s
    return stats


def _looks_like_attention(name: str, arr: np.ndarray) -> bool:
    """Softmaxed attention weights: a 4-dim (B, h, T, T) intermediate from
    an attn-weights module whose rows sum to ~1."""
    if arr.ndim != 4 or arr.shape[-1] != arr.shape[-2]:
        return False
    rows = np.asarray(arr[..., :1, :], np.float32).sum(axis=-1)
    return bool(np.all(np.abs(rows - 1.0) < 1e-2))


def find_nonfinite(tree: Any, prefix: str = "") -> Dict[str, int]:
    """Return {path: count_nonfinite} for every offending leaf."""
    bad = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        if not hasattr(leaf, "dtype"):
            continue
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n = int((~np.isfinite(arr)).sum())
        if n:
            name = prefix + "/".join(
                str(getattr(p, "key", p)) for p in path
            )
            bad[name] = n
    return bad


def assert_all_finite(tree: Any, what: str = "tree") -> None:
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {what}: {bad}")


@contextlib.contextmanager
def profile(logdir: str):
    """jax profiler trace (view with tensorboard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def format_stats(
    stats: Dict[str, Dict[str, float]], top: int = 0, dimwise: bool = True
) -> str:
    lines = []
    items = stats.items()
    if top:
        items = sorted(
            items, key=lambda kv: -kv[1].get("abs_p95", 0.0)
        )[:top]
    for name, s in items:
        lines.append(
            f"{name} shape={s.get('shape')} rms={s.get('rms', 0):.3g} "
            f"abs[p50={s.get('abs_p50', 0):.3g} p95={s.get('abs_p95', 0):.3g}] "
            f"range=[{s.get('min', 0):.3g},{s.get('max', 0):.3g}] "
            f"pos={s.get('frac_pos', 0):.2f}"
        )
        if dimwise:
            for d, ds in (s.get("dims") or {}).items():
                for key in ("abs", "positive", "rms", "value", "eigs"):
                    if key in ds:
                        lines.append(
                            f"  dim={d} size={ds['size']} {key} "
                            f"percentiles {_fmt_pcts(ds[key])}"
                        )
    return "\n".join(lines)
