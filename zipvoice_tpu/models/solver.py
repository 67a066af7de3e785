"""Euler ODE solver with classifier-free guidance as a single scanned program.

The reference runs a python loop of model calls (reference
zipvoice/models/modules/solver.py:229-240) with a CFG wrapper that doubles the
batch and branches on t>0.5 (solver.py:40-110).  Here the whole trajectory is
one ``jax.lax.scan`` inside the jitted sample program: the t>0.5 branch is a
``jnp.where`` on scan-carried timesteps, so a single compiled executable
serves any (num_step, guidance_scale) combination with static shapes.

``t_start``/``t_end`` may be python floats (static grids, inference) or
traced scalars (distillation training samples them per step); the shifted
grid formula matches the reference either way.
"""

from typing import Callable, Union

import jax
import jax.numpy as jnp
import numpy as np


def get_time_steps(
    t_start: float = 0.0,
    t_end: float = 1.0,
    num_step: int = 10,
    t_shift: float = 1.0,
) -> np.ndarray:
    """Shifted timestep grid (reference solver.py:256-281): linspace warped by
    t <- s*t / (1 + (s-1)*t), emphasizing the low-SNR region for s<1."""
    ts = np.linspace(
        np.float32(t_start), np.float32(t_end), num_step + 1, dtype=np.float32
    )
    return np.float32(t_shift) * ts / (1 + (np.float32(t_shift) - 1) * ts)


def _timesteps(t_start, t_end, num_step, t_shift):
    if isinstance(t_start, (int, float)) and isinstance(t_end, (int, float)):
        return jnp.asarray(get_time_steps(t_start, t_end, num_step, t_shift))
    # traced bounds (distill training)
    frac = jnp.linspace(0.0, 1.0, num_step + 1)
    ts = t_start + (t_end - t_start) * frac
    s = jnp.float32(t_shift)
    return s * ts / (1 + (s - 1) * ts)


# velocity_fn(t: (B,), x, text_condition, speech_condition, padding_mask,
#             guidance_scale: Optional[(B,)]) -> v
VelocityFn = Callable[..., jax.Array]


def euler_sample(
    velocity_fn: VelocityFn,
    x: jax.Array,
    text_condition: jax.Array,
    speech_condition: jax.Array,
    padding_mask: jax.Array,
    num_step: int,
    guidance_scale: Union[float, jax.Array] = 0.0,
    t_start: Union[float, jax.Array] = 0.0,
    t_end: Union[float, jax.Array] = 1.0,
    t_shift: float = 1.0,
    distill: bool = False,
) -> jax.Array:
    """Integrate the probability-flow ODE from t_start to t_end.

    - distill=False, guidance_scale != 0: CFG with batch doubling and the
      time-dependent trick (uncond branch drops the speech condition for
      t>0.5; for t<=0.5 it keeps it and doubles the scale; reference
      solver.py:83-110).  guidance_scale may be a scalar or (B,1,1) array
      (an array always takes the CFG path, matching reference usage where
      array scales are nonzero).
    - distill=True: guidance scale is an input to the network itself
      (reference solver.py:113-165), no batch doubling.
    """
    B = x.shape[0]
    ts = _timesteps(t_start, t_end, num_step, t_shift)
    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)  # (num_step, 2)

    if distill:
        gs_b = jnp.broadcast_to(
            jnp.asarray(guidance_scale, jnp.float32).reshape(-1), (B,)
        )

        def step(x, t_pair):
            t, t_next = t_pair[0], t_pair[1]
            v = velocity_fn(
                jnp.full((B,), t), x, text_condition, speech_condition,
                padding_mask, gs_b,
            )
            return x + v * (t_next - t), None

    elif (
        isinstance(guidance_scale, (int, float)) and float(guidance_scale) == 0.0
    ):

        def step(x, t_pair):
            t, t_next = t_pair[0], t_pair[1]
            v = velocity_fn(
                jnp.full((B,), t), x, text_condition, speech_condition,
                padding_mask, None,
            )
            return x + v * (t_next - t), None

    else:
        gs = jnp.asarray(guidance_scale, jnp.float32)
        if gs.ndim > 0:
            gs = gs.reshape(-1, 1, 1)  # (B,1,1) broadcasting over (B,T,F)
        pm2 = jnp.concatenate([padding_mask, padding_mask], axis=0)
        tc2 = jnp.concatenate(
            [jnp.zeros_like(text_condition), text_condition], axis=0
        )

        def step(x, t_pair):
            t, t_next = t_pair[0], t_pair[1]
            # time-dependent CFG (reference solver.py:90-98)
            uncond_speech = jnp.where(t > 0.5, 0.0, speech_condition)
            gs_eff = jnp.where(t > 0.5, gs, gs * 2.0)
            x2 = jnp.concatenate([x, x], axis=0)
            sc2 = jnp.concatenate([uncond_speech, speech_condition], axis=0)
            v2 = velocity_fn(
                jnp.full((2 * B,), t), x2, tc2, sc2, pm2, None
            )
            v_uncond, v_cond = jnp.split(v2, 2, axis=0)
            v = (1.0 + gs_eff) * v_cond - gs_eff * v_uncond
            return x + v * (t_next - t), None

    x, _ = jax.lax.scan(step, x, t_pairs)
    return x
