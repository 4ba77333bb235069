"""Checkpoint/resume: deterministic restart of the optimization loop
(SURVEY.md §5 — the reference has none; ours must restart from a saved
step bit-exactly)."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from fovtrace.dist import checkpoint as ckpt


def _state(seed):
    r = np.random.default_rng(seed)
    return {
        "params": {"eye": jnp.asarray(r.normal(size=3), jnp.float32),
                   "kd": jnp.asarray(r.normal(size=(4, 3)), jnp.float32)},
        "count": jnp.asarray(seed, jnp.int32),
    }


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path)
    s = _state(3)
    ckpt.save(d, 3, s)
    step, back = ckpt.restore(d, _state(0))
    assert step == 3
    np.testing.assert_array_equal(back["params"]["eye"], s["params"]["eye"])
    np.testing.assert_array_equal(back["count"], s["count"])


def test_latest_and_keep(tmp_path):
    d = str(tmp_path)
    for i in [1, 5, 9, 13]:
        ckpt.save(d, i, _state(i), keep=2)
    assert ckpt.all_steps(d) == [9, 13]
    assert ckpt.latest_step(d) == 13
    step, back = ckpt.restore(d, _state(0))
    assert step == 13 and int(back["count"]) == 13


def test_restore_or_init_empty(tmp_path):
    init = _state(7)
    step, s = ckpt.restore_or_init(str(tmp_path / "nope"), init)
    assert step == 0
    np.testing.assert_array_equal(s["count"], init["count"])


def test_optimizer_state_roundtrip(tmp_path):
    """Resume reproduces the exact trajectory: run 4 steps; checkpoint at
    2; resume and re-run 2 -> identical final params."""
    d = str(tmp_path)

    def loss(p):
        return jnp.sum((p - 3.0) ** 2)

    opt = optax.adam(0.1)
    p = jnp.zeros(4)
    st = opt.init(p)

    import jax

    @jax.jit
    def step(p, st):
        g = jax.grad(loss)(p)
        up, st = opt.update(g, st)
        return optax.apply_updates(p, up), st

    hist = []
    for i in range(4):
        p, st = step(p, st)
        hist.append(p)
        if i == 1:
            ckpt.save(d, 2, (p, st))

    step_n, (p2, st2) = ckpt.restore(d, (p, st))
    assert step_n == 2
    for _ in range(2):
        p2, st2 = step(p2, st2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(hist[-1]),
                               rtol=1e-6)


def test_optimize_cli_smoke(tmp_path):
    """End-to-end inverse rendering: loss decreases, eye error shrinks,
    and a resume from checkpoint continues without error."""
    from fovtrace.app import optimize

    d = str(tmp_path / "ck")
    rc = optimize.main([
        "--scene", "box", "--width", "32", "--height", "32",
        "--steps", "8", "--ckpt", d, "--ckpt-every", "4",
        "--perturb", "0.25", "--lr", "3e-2",
    ])
    assert rc == 0
    assert ckpt.latest_step(d) == 8
    # resume: runs the remaining 0 steps and exits cleanly
    rc = optimize.main([
        "--scene", "box", "--width", "32", "--height", "32",
        "--steps", "8", "--ckpt", d, "--perturb", "0.25",
    ])
    assert rc == 0
