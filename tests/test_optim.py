"""ScaledAdam parity vs the reference torch optimizer, and Eden schedule."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _run_ref(params_np, grads_seq, **kw):
    from zipvoice.utils.optim import ScaledAdam

    tparams = [
        torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params_np
    ]
    named = [(f"p{i}", p) for i, p in enumerate(tparams)]
    opt = ScaledAdam(named, lr=kw.get("lr", 0.045),
                     clipping_scale=kw.get("clipping_scale"),
                     betas=(0.9, 0.98))
    for grads in grads_seq:
        for p, g in zip(tparams, grads):
            p.grad = torch.from_numpy(g.copy())
        opt.step()
        opt.zero_grad()
    return [p.detach().numpy() for p in tparams]


def _run_ours(params_np, grads_seq, **kw):
    from zipvoice_tpu.train.optim import scaled_adam

    tx = scaled_adam(lr=kw.get("lr", 0.045),
                     clipping_scale=kw.get("clipping_scale"),
                     betas=(0.9, 0.98))
    params = {f"p{i}": jnp.asarray(p) for i, p in enumerate(params_np)}
    state = tx.init(params)

    @jax.jit
    def step(params, state, grads):
        updates, state = tx.update(grads, state, params)
        import optax

        return optax.apply_updates(params, updates), state

    for grads in grads_seq:
        g = {f"p{i}": jnp.asarray(x) for i, x in enumerate(grads)}
        params, state = step(params, state, g)
    return [np.asarray(params[f"p{i}"]) for i in range(len(params_np))]


def _make_inputs(n_steps, seed=0):
    rng = np.random.RandomState(seed)
    params = [
        rng.randn(6, 4).astype(np.float32) * 0.5,
        rng.randn(1).astype(np.float32),
        rng.randn(8).astype(np.float32) * 0.1,
    ]
    grads_seq = [
        [0.1 * rng.randn(*p.shape).astype(np.float32) for p in params]
        for _ in range(n_steps)
    ]
    return params, grads_seq


@requires_reference
@pytest.mark.parametrize("n_steps", [3, 11])
def test_scaled_adam_parity(n_steps):
    params, grads_seq = _make_inputs(n_steps)
    ref = _run_ref(params, grads_seq)
    ours = _run_ours(params, grads_seq)
    for r, o in zip(ref, ours):
        np.testing.assert_allclose(o, r, atol=2e-6, rtol=2e-5)


@requires_reference
def test_scaled_adam_parity_with_clipping():
    params, grads_seq = _make_inputs(25, seed=4)
    ref = _run_ref(params, grads_seq, clipping_scale=2.0)
    ours = _run_ours(params, grads_seq, clipping_scale=2.0)
    for r, o in zip(ref, ours):
        np.testing.assert_allclose(o, r, atol=2e-6, rtol=2e-5)


@requires_reference
def test_eden_schedule():
    from zipvoice.utils.lr_scheduler import Eden
    from zipvoice.utils.optim import ScaledAdam
    from zipvoice_tpu.train.optim import eden_schedule

    p = torch.nn.Parameter(torch.zeros(3, 3))
    opt = ScaledAdam([("p", p)], lr=0.045)
    sched = Eden(opt, lr_batches=7500, lr_epochs=10, warmup_batches=500)
    ours = eden_schedule(
        base_lr=0.045, lr_batches=7500, lr_epochs=10, warmup_batches=500,
        batches_per_epoch=1000,
    )
    for b in (1, 100, 499, 500, 2000, 50000):
        sched.step_batch(b)
        sched.step_epoch(b / 1000)
        ref_lr = sched.get_lr()[0]
        np.testing.assert_allclose(float(ours(b)), ref_lr, rtol=1e-5)
