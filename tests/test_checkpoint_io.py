"""Orbax checkpoint save/load round trip + diagnostics utilities."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def test_orbax_roundtrip(tmp_path):
    from zipvoice_tpu.train.optim import scaled_adam
    from zipvoice_tpu.train.train_step import init_train_state
    from zipvoice_tpu.utils import checkpoint_io

    params = {
        "dense": {"kernel": jnp.arange(12.0).reshape(3, 4),
                  "bias": jnp.ones((4,))},
        "scalar": jnp.asarray(2.5),
    }
    tx = scaled_adam(lr=0.01)
    state = init_train_state(params, tx)

    path = str(tmp_path / "ckpt")
    checkpoint_io.save_checkpoint(
        path, jax.device_get(state),
        extra={"sampler": {"epoch": 3, "batch": 7, "seed": 42},
               "batch_idx_train": 123, "average_period": 200},
    )
    restored, extra = checkpoint_io.load_checkpoint(
        path, jax.device_get(state)
    )
    assert extra["batch_idx_train"] == 123
    assert extra["sampler"]["batch"] == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["dense"]["kernel"]),
        np.asarray(params["dense"]["kernel"]),
    )
    assert int(restored.step) == 0


def test_diagnostics_stats_and_finite():
    from zipvoice_tpu.models.zipformer import TTSZipformer
    from zipvoice_tpu.utils.diagnostics import (
        assert_all_finite,
        collect_module_stats,
        find_nonfinite,
        format_stats,
    )

    model = TTSZipformer(
        in_dim=8, out_dim=4, downsampling_factor=(1,),
        num_encoder_layers=(1,), cnn_module_kernel=(5,), encoder_dim=32,
        feedforward_dim=48, num_heads=4, query_head_dim=8, pos_head_dim=4,
        value_head_dim=12, pos_dim=48, use_time_embed=False,
    )
    x = jnp.ones((1, 16, 8))
    variables = model.init(jax.random.PRNGKey(0), x)
    stats = collect_module_stats(model, variables, x)
    assert stats, "no intermediates captured"
    text = format_stats(stats, top=5)
    assert "rms=" in text

    good = {"a": jnp.ones((3,))}
    assert find_nonfinite(good) == {}
    bad = {"a": jnp.asarray([1.0, np.inf, np.nan])}
    assert find_nonfinite(bad)["a"] == 2
    try:
        assert_all_finite(bad, "test")
        raise AssertionError("should have raised")
    except FloatingPointError:
        pass


def test_generate_averaged_model_iter(tmp_path):
    """--iter mode must average over EXISTING checkpoint-* saves (which land
    at multiples of --save-every-n), not fabricate checkpoint-{iter-avg}
    names (reference find_checkpoints semantics)."""
    import os
    import subprocess
    import sys

    from zipvoice_tpu.train.averaging import (
        average_checkpoints_with_averaged_model,
    )
    from zipvoice_tpu.utils import checkpoint_io

    period = 100
    exp = tmp_path / "exp"
    exp.mkdir()
    avgs = {}
    for it in (500, 1000, 1500):
        params = {"w": np.full((4,), float(it))}
        avg = {"w": np.full((4,), float(it) / 2, np.float64)}
        avgs[it] = avg
        checkpoint_io.save_checkpoint(
            str(exp / f"checkpoint-{it}"), params,
            extra={"batch_idx_train": it, "average_period": period},
        )
        checkpoint_io.save_checkpoint(str(exp / f"checkpoint-{it}-avg"), avg)

    out = tmp_path / "model"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "zipvoice_tpu.bin.generate_averaged_model",
         "--exp-dir", str(exp), "--iter", "1500", "--avg", "2",
         "--out", str(out)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    got, _ = checkpoint_io.load_checkpoint(str(out))
    want = average_checkpoints_with_averaged_model(
        avgs[500], avgs[1500], 500, 1500, period
    )
    np.testing.assert_allclose(np.asarray(got["w"]), want["w"], rtol=1e-6)
