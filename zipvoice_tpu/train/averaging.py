"""Running/offline model parameter averaging.

Reference: zipvoice/utils/checkpoint.py:295-360,480-511.  The online running
average is fp64 (the reference casts model_avg to double); TPUs have no
native fp64 and jax disables x64 by default, so the average lives on the
HOST as numpy float64 — it is touched only once per ``average_period``
(default 200) steps, so the transfer cost is negligible.
"""

import jax
import numpy as np


def init_model_avg(params):
    return jax.tree.map(
        lambda p: np.asarray(p, dtype=np.float64), params
    )


def update_averaged_model(model_avg, params, batch_idx: int, average_period: int):
    """model_avg <- model_avg*(1 - w) + params*w, w = average_period/batch_idx
    (reference checkpoint.py:480-511)."""
    w = average_period / max(batch_idx, 1)
    return jax.tree.map(
        lambda a, p: a * (1.0 - w) + np.asarray(p, np.float64) * w,
        model_avg, params,
    )


def average_checkpoints_with_averaged_model(
    avg_start, avg_end, batch_idx_start: int, batch_idx_end: int,
    average_period: int,
):
    """Average over (start, end]: (end*b_end - start*b_start) / interval
    (reference checkpoint.py:295-360).  Returns fp32 params."""
    b_start = (batch_idx_start // average_period) * average_period
    b_end = (batch_idx_end // average_period) * average_period
    interval = b_end - b_start
    assert interval > 0, (b_start, b_end)
    weight_end = b_end / interval
    weight_start = 1 - weight_end
    return jax.tree.map(
        lambda e, s: np.asarray(
            (e + s * (weight_start / weight_end)) * weight_end, np.float32
        ),
        avg_end, avg_start,
    )
