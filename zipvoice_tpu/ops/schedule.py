"""Batch-count training schedules (functional ScheduledFloat).

The reference saturates its training recipe with batch-count-indexed
piecewise-linear schedules (``/root/reference/zipvoice/models/modules/scaling.py:86-262``):
dropout 0.3->0.1 over 20k batches (zipformer.py:133-134), per-module skip
rates and const_attention_rate (zipformer.py:328-346), scheduled balancer
bounds (zipformer.py:421-443,1470-1471,1592-1619), whitening limits
(zipformer.py:296-297), bypass scale clamping (zipformer.py:760), and
per-layer layerdrop warmup ramps (zipformer.py:688-699).

There, ``ScheduledFloat`` is an nn.Module whose ``batch_count`` attribute is
mutated by the training loop (common.py:320-327) and read with ``float()``.
TPU-first we invert the dataflow: schedules are *static* (hashable) tables
attached to flax modules, and the training loop threads one traced scalar —
the adjusted batch count — through the forward pass.  Each consumer resolves
its value with ``jnp.interp``, so every step runs the same compiled program;
only the scalar input changes.

When ``batch_count`` is None (inference, or schedule-free training) each
schedule resolves to its ``default`` exactly like the reference's
``ScheduledFloat.__float__`` outside training (scaling.py:232-244).
"""

from dataclasses import dataclass
from typing import Tuple, Union

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PiecewiseLinear:
    """Piecewise-linear float->float map (reference scaling.py:86-196).

    ``pairs`` is a tuple of (x, y) with strictly increasing x; inputs outside
    the range clamp to the endpoint y values (jnp.interp semantics, which
    match the reference's __call__ at scaling.py:113-125).
    """

    pairs: Tuple[Tuple[float, float], ...]

    def __post_init__(self):
        assert len(self.pairs) >= 1
        object.__setattr__(
            self,
            "pairs",
            tuple((float(x), float(y)) for x, y in self.pairs),
        )
        for i in range(len(self.pairs) - 1):
            assert self.pairs[i + 1][0] > self.pairs[i][0], self.pairs

    def __call__(self, x) -> Union[float, jax.Array]:
        xs = [p[0] for p in self.pairs]
        ys = [p[1] for p in self.pairs]
        if isinstance(x, (int, float)):  # python-level (e.g. tests, CLIs)
            if x <= xs[0]:
                return ys[0]
            if x >= xs[-1]:
                return ys[-1]
            for i in range(1, len(xs)):
                if x <= xs[i]:
                    f = (x - xs[i - 1]) / (xs[i] - xs[i - 1])
                    return ys[i - 1] + f * (ys[i] - ys[i - 1])
            raise AssertionError
        return jnp.interp(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(xs, jnp.float32),
            jnp.asarray(ys, jnp.float32),
        )


@dataclass(frozen=True)
class ScheduledFloat:
    """A float whose value follows a PiecewiseLinear schedule of the batch
    count (reference scaling.py:199-262).  Hashable, so usable as a flax
    module attribute.  ``default`` is the out-of-training value."""

    schedule: PiecewiseLinear
    default: float = 0.0

    @staticmethod
    def of(*pairs, default: float = 0.0) -> "ScheduledFloat":
        return ScheduledFloat(PiecewiseLinear(tuple(pairs)), default)

    def __call__(self, batch_count) -> Union[float, jax.Array]:
        """Resolve at ``batch_count``; None -> default (like the reference's
        float() outside training)."""
        if batch_count is None:
            return self.default
        return self.schedule(batch_count)


FloatLike = Union[float, ScheduledFloat]


def resolve(value: FloatLike, batch_count) -> Union[float, jax.Array]:
    """Resolve a float-or-schedule; plain floats pass through."""
    if isinstance(value, (int, float)):
        return value
    return value(batch_count)


def whitening_schedule(x: float, ratio: float = 2.0) -> ScheduledFloat:
    """reference zipformer.py:296-297."""
    return ScheduledFloat.of((0.0, x), (20000.0, ratio * x), default=x)


# --- The reference's schedule tables (file:line cited per entry). ---
#
# Defaults (the batch_count=None resolution) are the schedules' *final*
# values for balancer bounds — balancers never run outside training in the
# reference, so its ctor defaults (mostly 0.0) are dead; ours keep the
# schedule-free training path identical to the pre-schedule build.

# TTSZipformer default dropout (zipformer.py:133-134)
DROPOUT = ScheduledFloat.of((0.0, 0.3), (20000.0, 0.1), default=0.1)
# Zipformer2EncoderLayer defaults (zipformer.py:328-346)
ATTENTION_SKIP = ScheduledFloat.of(
    (0.0, 0.2), (4000.0, 0.05), (16000.0, 0.0), default=0.0
)
CONV_SKIP = ScheduledFloat.of(
    (0.0, 0.2), (4000.0, 0.05), (16000.0, 0.0), default=0.0
)
CONST_ATTENTION = ScheduledFloat.of((0.0, 0.25), (4000.0, 0.025), default=0.0)
FF2_SKIP = ScheduledFloat.of(
    (0.0, 0.1), (4000.0, 0.01), (50000.0, 0.0), default=0.0
)
FF3_SKIP = ScheduledFloat.of(
    (0.0, 0.1), (4000.0, 0.01), (50000.0, 0.0), default=0.0
)
# BypassModule scale clamp (zipformer.py:760)
BYPASS_SCALE_MIN = ScheduledFloat.of((0.0, 0.9), (20000.0, 0.2), default=0.0)
# RelPositionMultiheadAttentionWeights (zipformer.py:1089)
POS_EMB_SKIP = ScheduledFloat.of((0.0, 0.5), (4000.0, 0.0), default=0.0)
# Default Balancer application probability (reference scaling.py:631-633);
# the None-resolution keeps the pre-schedule build's fixed 0.25 coin.
BALANCER_PROB = ScheduledFloat.of((0.0, 0.5), (8000.0, 0.125), default=0.25)
# Scheduled balancer bounds
BALANCER_NA_MIN_ABS = ScheduledFloat.of(
    (0.0, 0.004), (4000.0, 0.02), default=0.02
)  # zipformer.py:421
BALANCER_FF2_MIN_ABS = ScheduledFloat.of(
    (0.0, 0.0), (4000.0, 0.1), default=0.1
)  # zipformer.py:433
BALANCER_FF3_MIN_ABS = ScheduledFloat.of(
    (0.0, 0.0), (4000.0, 0.2), default=0.2
)  # zipformer.py:443
NONLIN_MIN_POSITIVE = ScheduledFloat.of(
    (0.0, 0.25), (20000.0, 0.05), default=0.05
)  # zipformer.py:1470
NONLIN_MAX_POSITIVE = ScheduledFloat.of(
    (0.0, 0.75), (20000.0, 0.95), default=0.95
)  # zipformer.py:1471
CONV_B1_MIN_POSITIVE = ScheduledFloat.of(
    (0.0, 0.05), (8000.0, 0.025), default=0.025
)  # zipformer.py:1592
CONV_B1_MAX_ABS = ScheduledFloat.of(
    (0.0, 5.0), (8000.0, 10.0), default=10.0
)  # zipformer.py:1595
CONV_B2_MIN_POSITIVE = ScheduledFloat.of(
    (0.0, 0.1), (8000.0, 0.05), default=0.05
)  # zipformer.py:1617
CONV_B2_MIN_ABS = ScheduledFloat.of(
    (0.0, 0.2), (20000.0, 0.5), default=0.5
)  # zipformer.py:1619
# Whitening limits
WHITEN_LAYER = whitening_schedule(4.0, ratio=3.0)  # zipformer.py:450
WHITEN_KEYS = whitening_schedule(3.0)  # zipformer.py:1117
WHITEN_SELF_ATTN = whitening_schedule(7.5, ratio=3.0)  # zipformer.py:1354
WHITEN_FF = whitening_schedule(7.5)  # zipformer.py:1428
WHITEN_NONLIN = whitening_schedule(5.0)  # zipformer.py:1487
WHITEN_NONLIN2 = whitening_schedule(5.0, ratio=3.0)  # zipformer.py:1494
WHITEN_CONV = whitening_schedule(7.5)  # zipformer.py:1625


def layerdrop_schedule(
    warmup_begin: float,
    warmup_end: float,
    num_layers: int,
    layer_index: int,
    initial_layerdrop_rate: float = 0.5,
    final_layerdrop_rate: float = 0.05,
) -> ScheduledFloat:
    """Per-layer bypass skip-rate ramp (reference zipformer.py:688-699):
    the [warmup_begin, warmup_end] window is subdivided equally among the
    stack's layers; layer i ramps from 0.5 down to final_layerdrop_rate over
    its own sub-window."""
    assert 0 <= warmup_begin <= warmup_end
    delta = (1.0 / num_layers) * (warmup_end - warmup_begin)
    cur_begin = warmup_begin + layer_index * delta
    cur_end = cur_begin + delta
    return ScheduledFloat.of(
        (cur_begin, initial_layerdrop_rate),
        (cur_end, final_layerdrop_rate),
        default=0.0,
    )


def adjusted_batch_count(
    step,
    max_duration: float,
    world_size: int = 1,
    ref_duration: float = 50.0,
    finetune: bool = False,
):
    """The schedule clock (reference common.py:310-317 + train_zipvoice.py:553-557):
    batches are rescaled to a reference batch duration, quantized to steps of
    10, and shifted past every ramp (+100000) when finetuning.  ``step`` may
    be a traced scalar — the result is then traced too (one compiled program
    for the whole run)."""
    step = (step // 10) * 10
    count = step * (max_duration * world_size) / ref_duration
    if finetune:
        count = count + 100000
    return count
