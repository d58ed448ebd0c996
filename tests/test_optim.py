"""fused_adam == optax.adam on arbitrary pytrees (vnet_tpu/train/optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vnet_tpu.train.optim import build_optimizer, fused_adam


def _tree(rng):
    return {
        "a": jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32)),
        "b": {"w": jnp.asarray(rng.normal(size=(2, 2, 4)).astype(np.float32)),
              "bias": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))},
    }


def test_fused_adam_matches_optax_adam():
    rng = np.random.default_rng(0)
    params_a = _tree(rng)
    params_b = jax.tree.map(jnp.copy, params_a)
    # fast decay (0.5 every 10 steps) so a schedule-step offset would move
    # the update by ~7% per step — this test failed on the (since fixed)
    # schedule(count+1) off-by-one that a 0.99/100 schedule had masked
    sched = optax.exponential_decay(1e-2, 10, 0.5)
    ref = optax.adam(sched)
    fus = fused_adam(sched)
    s_ref = ref.init(params_a)
    s_fus = fus.init(params_b)
    for step in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(step).normal(
                    size=p.shape).astype(np.float32)), params_a)
        u_ref, s_ref = ref.update(grads, s_ref, params_a)
        u_fus, s_fus = fus.update(grads, s_fus, params_b)
        params_a = optax.apply_updates(params_a, u_ref)
        params_b = optax.apply_updates(params_b, u_fus)
        diffs = jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), params_a, params_b)
        # fp-rounding-level tolerance: optax computes the bias-correction
        # power via integer_pow, fused_adam via float pow — identical
        # semantics, last-ulp differences on the 1e-2-scale update
        assert max(jax.tree.leaves(diffs)) < 1e-6 * (step + 1), (step, diffs)


def test_fused_adam_under_jit_and_scan():
    rng = np.random.default_rng(1)
    params = _tree(rng)
    fus = fused_adam(1e-3)
    state = fus.init(params)

    @jax.jit
    def run(params, state):
        def body(c, _):
            p, s = c
            g = jax.tree.map(jnp.ones_like, p)
            u, s = fus.update(g, s, p)
            return (optax.apply_updates(p, u), s), jnp.float32(0)
        (p, s), _ = jax.lax.scan(body, (params, state), jnp.arange(3))
        return p, s

    p, s = run(params, state)
    assert int(s.count) == 3
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(p))


def test_flat_adam_matches_optax_adam_trajectory():
    """The permanently-flat train state (FlatAdamCarry) follows the exact
    optax.adam trajectory: differentiating w.r.t. the flat vector and
    updating flat must equal per-tensor Adam on the pytree."""
    from vnet_tpu.train.optim import flat_adam_init, flat_adam_step

    rng = np.random.default_rng(2)
    params = _tree(rng)
    sched = optax.exponential_decay(1e-2, 10, 0.5)

    def loss(p, x):
        h = jnp.tanh(p["a"] @ x)                      # (5,)
        w = p["b"]["w"].reshape(4, 4) @ h[:4]
        return jnp.sum((w + p["b"]["bias"]) ** 2)

    ref = optax.adam(sched)
    s_ref = ref.init(params)
    fc, unravel = flat_adam_init(params)

    @jax.jit
    def run_flat(fc, xs):
        def body(c, x):
            g = jax.grad(lambda pf: loss(unravel(pf), x))(c.flat)
            return flat_adam_step(c, g, sched), jnp.float32(0)
        c, _ = jax.lax.scan(body, fc, xs)
        return c

    xs = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    fc = run_flat(fc, xs)
    p_ref = params
    for i in range(4):
        g = jax.grad(loss)(p_ref, xs[i])
        u, s_ref = ref.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
    got = unravel(fc.flat)
    diffs = jax.tree.map(lambda x, y: float(jnp.max(jnp.abs(x - y))),
                         got, p_ref)
    assert int(fc.count) == 4
    assert max(jax.tree.leaves(diffs)) < 5e-6, diffs


def test_build_optimizer_fused_name():
    from vnet_tpu.config import OptimizerConfig
    cfg = OptimizerConfig(name="FusedAdam", initial_learning_rate=1e-3,
                          decay_factor=0.99, decay_steps=100)
    tx, sched = build_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    s = tx.init(params)
    u, s = tx.update({"w": jnp.ones((3,))}, s, params)
    assert u["w"].shape == (3,)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
