"""Pallas kernel correctness vs XLA references (interpreter mode on CPU;
the same kernels compile via Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.ops.pallas import blend_accumulate_rows, fused_bias_prelu_residual


def test_fused_bias_prelu_residual_matches_reference(rng):
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    res = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    alpha = np.full((16,), 0.1, np.float32)

    got = fused_bias_prelu_residual(jnp.asarray(x), jnp.asarray(res),
                                    jnp.asarray(bias), jnp.asarray(alpha),
                                    interpret=True)
    y = x + bias + res
    expected = np.maximum(y, 0) + alpha * np.minimum(y, 0)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_blend_accumulate_rows_matches_numpy(rng):
    R, C = 64, 3
    rows = 8
    n = 5
    acc = np.zeros((R, C), np.float32)
    weight = np.zeros((R, 1), np.float32)
    probs = rng.random((n, rows, C)).astype(np.float32)
    window = rng.random((rows, 1)).astype(np.float32) + 0.5
    starts = np.array([0, 8, 4, 40, 56], np.int32)

    got_acc, got_w = blend_accumulate_rows(
        jnp.asarray(acc), jnp.asarray(weight), jnp.asarray(probs),
        jnp.asarray(window), jnp.asarray(starts), interpret=True)

    exp_acc = acc.copy()
    exp_w = weight.copy()
    for i, s in enumerate(starts):
        exp_acc[s:s + rows] += probs[i] * window
        exp_w[s:s + rows] += window
    np.testing.assert_allclose(np.asarray(got_acc), exp_acc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), exp_w, rtol=1e-5)


def test_blend_accumulate_overlapping_sequential(rng):
    """Overlapping segments must accumulate both contributions (grid runs
    sequentially — the read-modify-write is race-free)."""
    R, C, rows = 16, 2, 8
    acc = jnp.zeros((R, C), jnp.float32)
    weight = jnp.zeros((R, 1), jnp.float32)
    probs = jnp.ones((2, rows, C), jnp.float32)
    window = jnp.ones((rows, 1), jnp.float32)
    starts = jnp.asarray([0, 4], jnp.int32)
    got_acc, got_w = blend_accumulate_rows(acc, weight, probs, window,
                                           starts, interpret=True)
    np.testing.assert_allclose(np.asarray(got_w)[4:8, 0], 2.0)
    np.testing.assert_allclose(np.asarray(got_w)[0:4, 0], 1.0)
    np.testing.assert_allclose(np.asarray(got_acc)[4:8], 2.0)


def test_bn_stats_kernel_matches_xla():
    from vnet_tpu.ops.pallas.fused import bn_stats
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 32)).astype(np.float32))
    s, sq = bn_stats(x, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(
        jnp.sum(x, axis=(0, 1, 2))), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(
        jnp.sum(x * x, axis=(0, 1, 2))), rtol=1e-5)


def test_bn_stats_kernel_bf16_uneven_tile():
    from vnet_tpu.ops.pallas.fused import bn_stats
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 5, 16)).astype(np.float32)
                    ).astype(jnp.bfloat16)  # rows=30, forces tile search
    s, sq = bn_stats(x, interpret=True)
    xf = x.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(jnp.sum(xf, axis=(0, 1))),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(sq),
                               np.asarray(jnp.sum(xf * xf, axis=(0, 1))),
                               rtol=1e-2, atol=1e-2)


def test_bn_grad_stats_kernel():
    from vnet_tpu.ops.pallas.fused import bn_grad_stats
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 8, 32)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(4, 8, 32)).astype(np.float32))
    mean = jnp.mean(x, axis=(0, 1))
    inv = 1.0 / (jnp.std(x, axis=(0, 1)) + 1e-3)
    sdy, sdx = bn_grad_stats(dy, x, mean, inv, interpret=True)
    xhat = (x - mean) * inv
    np.testing.assert_allclose(np.asarray(sdy),
                               np.asarray(jnp.sum(dy, axis=(0, 1))),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sdx),
                               np.asarray(jnp.sum(dy * xhat, axis=(0, 1))),
                               rtol=1e-4)


def test_blend_accumulate_patches_matches_numpy(rng):
    """Rank-generic kernel: the channel axis is just another sliced axis
    (start 0, full extent)."""
    from vnet_tpu.ops.pallas import blend_accumulate_patches
    D, H, W, C = 12, 10, 8, 3
    pd, ph, pw = 6, 4, 4
    n = 4
    acc = rng.random((D, H, W, C)).astype(np.float32)
    probs = rng.random((n, pd, ph, pw, C)).astype(np.float32)
    starts = np.array([[0, 0, 0], [6, 6, 4], [2, 3, 1], [2, 3, 1]],
                      np.int32)  # unaligned + duplicated (padded-tail) starts
    starts4 = np.concatenate([starts, np.zeros((n, 1), np.int32)], axis=1)

    got = blend_accumulate_patches(
        jnp.asarray(acc), jnp.asarray(probs), jnp.asarray(starts4),
        slab_bytes=ph * pw * C * 4 * 2,  # force multi-slab path
        interpret=True)

    exp = acc.copy()
    for i, (sd, sh, sw) in enumerate(starts):
        exp[sd:sd + pd, sh:sh + ph, sw:sw + pw] += probs[i]
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5)

    # the production fold (sliding_window.py): channels folded into the
    # minor spatial axis, starts scaled by C — identical result
    got_f = blend_accumulate_patches(
        jnp.asarray(acc).reshape(D, H, W * C),
        jnp.asarray(probs).reshape(n, pd, ph, pw * C),
        jnp.asarray(np.concatenate(
            [starts[:, :2], starts[:, 2:] * C], axis=1)),
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_f).reshape(D, H, W, C), exp,
                               rtol=1e-5)


def test_blend_accumulate_patches_2d(rng):
    from vnet_tpu.ops.pallas import blend_accumulate_patches
    H, W, C = 16, 12, 2
    ph, pw = 8, 6
    acc = np.zeros((H, W, C), np.float32)
    probs = rng.random((3, ph, pw, C)).astype(np.float32)
    starts = np.array([[0, 0, 0], [8, 6, 0], [5, 3, 0]], np.int32)

    got = blend_accumulate_patches(jnp.asarray(acc), jnp.asarray(probs),
                                   jnp.asarray(starts), interpret=True)
    exp = acc.copy()
    for i, (sh, sw, _) in enumerate(starts):
        exp[sh:sh + ph, sw:sw + pw] += probs[i]
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-5)


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
