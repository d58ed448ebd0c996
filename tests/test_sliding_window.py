"""Sliding-window grid + blending golden tests
(reference model.py:866-937 semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vnet_tpu.infer import (SlidingWindowInference, build_patch_grid,
                            cosine_window, patch_starts_1d)


def test_patch_starts_exact_fit():
    # dim 8, patch 4, stride 4 -> starts 0, 4
    assert patch_starts_1d(8, 4, 4) == [0, 4]


def test_patch_starts_clamped():
    # dim 10, patch 4, stride 4: ceil((10-4)/4)+1 = 3 starts; last clamped
    # to 6 (model.py:881-893)
    assert patch_starts_1d(10, 4, 4) == [0, 4, 6]


def test_patch_starts_patch_equals_dim():
    assert patch_starts_1d(4, 4, 4) == [0]


def test_build_patch_grid_order():
    grid = build_patch_grid((8, 8, 4), (4, 4, 4), (4, 4, 4))
    assert grid.shape == (4, 3)
    # k fastest (model.py:874-876 loop order)
    np.testing.assert_array_equal(grid[0], [0, 0, 0])
    np.testing.assert_array_equal(grid[1], [0, 4, 0])
    np.testing.assert_array_equal(grid[2], [4, 0, 0])


def test_full_coverage_weight():
    """Every voxel visited at least once; uniform stride=patch -> weight 1."""
    def apply_fn(variables, patches):
        b = patches.shape[0]
        return jnp.zeros(patches.shape[:-1] + (2,))

    eng = SlidingWindowInference(apply_fn, (4, 4, 4), (4, 4, 4),
                                 batch_size=2, num_classes=2)
    vol = np.zeros((8, 8, 8, 1), np.float32)
    acc, weight = eng({}, vol)
    np.testing.assert_allclose(np.asarray(weight), 1.0)


def test_overlap_blending_averages():
    """With stride < patch, overlapping softmax accumulates and the
    weighted average is position-independent for a constant predictor."""
    def apply_fn(variables, patches):
        logits = jnp.zeros(patches.shape[:-1] + (2,))
        return logits.at[..., 1].set(2.0)  # constant confidence

    eng = SlidingWindowInference(apply_fn, (4, 4, 4), (2, 2, 2),
                                 batch_size=3, num_classes=2)
    vol = np.zeros((8, 8, 8, 1), np.float32)
    acc, weight = eng({}, vol)
    acc, weight = np.asarray(acc), np.asarray(weight)
    assert weight.min() >= 1.0
    assert weight.max() > 1.0  # overlaps exist
    prob = acc[..., 1] / weight
    expected = float(jnp.exp(2.0) / (1.0 + jnp.exp(2.0)))
    np.testing.assert_allclose(prob, expected, rtol=1e-5)


def test_blend_matches_naive_numpy():
    """Golden test: identity network on volume values -> blended result
    equals a naive host loop."""
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(6, 6, 6, 1)).astype(np.float32)

    def apply_fn(variables, patches):
        # logits: class1 = patch value, class0 = 0
        v = patches[..., 0]
        return jnp.stack([jnp.zeros_like(v), v], axis=-1)

    patch, stride = (4, 4, 4), (2, 2, 2)
    eng = SlidingWindowInference(apply_fn, patch, stride, batch_size=2,
                                 num_classes=2)
    acc, weight = eng({}, vol)

    # naive accumulation
    import itertools

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    starts = [0, 2]
    acc_ref = np.zeros((6, 6, 6, 2), np.float32)
    w_ref = np.zeros((6, 6, 6), np.float32)
    for i, j, k in itertools.product(starts, repeat=3):
        p = vol[i:i + 4, j:j + 4, k:k + 4, 0]
        logits = np.stack([np.zeros_like(p), p], -1)
        acc_ref[i:i + 4, j:j + 4, k:k + 4] += softmax(logits)
        w_ref[i:i + 4, j:j + 4, k:k + 4] += 1.0

    np.testing.assert_allclose(np.asarray(weight), w_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), acc_ref, rtol=1e-4)


def test_padded_tail_patches_do_not_change_argmax():
    """Grid size not divisible by batch: padded duplicate patches only add
    weight, never change the argmax."""
    def apply_fn(variables, patches):
        v = patches[..., 0]
        return jnp.stack([jnp.zeros_like(v), v], axis=-1)

    vol = np.random.default_rng(1).normal(size=(6, 6, 6, 1)).astype(np.float32)
    a1 = SlidingWindowInference(apply_fn, (4, 4, 4), (2, 2, 2), 3, 2)({}, vol)
    a2 = SlidingWindowInference(apply_fn, (4, 4, 4), (2, 2, 2), 8, 2)({}, vol)
    l1 = np.argmax(np.asarray(a1[0]), -1)
    l2 = np.argmax(np.asarray(a2[0]), -1)
    np.testing.assert_array_equal(l1, l2)


def test_cosine_window_properties():
    w = cosine_window((8, 8))
    assert w.shape == (8, 8)
    assert w.min() > 0
    assert w.max() <= 1.0
    # symmetric, centre-heavy
    np.testing.assert_allclose(w, w[::-1, ::-1], rtol=1e-6)
    assert w[4, 4] > w[0, 0]


def test_2d_mode():
    def apply_fn(variables, patches):
        v = patches[..., 0]
        return jnp.stack([jnp.zeros_like(v), v], axis=-1)

    vol = np.random.default_rng(2).normal(size=(8, 6, 1)).astype(np.float32)
    eng = SlidingWindowInference(apply_fn, (4, 4), (2, 2), 2, 2)
    acc, weight = eng({}, vol)
    assert np.asarray(acc).shape == (8, 6, 2)
    assert np.asarray(weight).min() >= 1.0


def test_volume_smaller_than_patch_raises():
    eng = SlidingWindowInference(lambda v, p: p, (8, 8, 8), (4, 4, 4), 1, 2)
    with pytest.raises(ValueError, match="pad first"):
        eng({}, np.zeros((4, 4, 4, 1), np.float32))


def test_hard_accumulate_reference_averaging_semantics():
    """Legacy hard-prediction averaging (`/root/reference/evaluate.py:
    264-271`): accumulate per-patch argmax, label = rint(sum/visits+0.01).
    Constructed so it DISAGREES with softmax-argmax blending on the
    double-visited band: preds 1 and 0 average to 0.5 -> rounds UP to 1,
    while the softmax sum favours class 0."""
    l1_hi = float(np.log(0.9 / 0.1))     # softmax -> prob1 = 0.90
    l1_lo = float(np.log(0.05 / 0.95))   # softmax -> prob1 = 0.05

    def apply_fn(variables, patches):
        v = patches[:, 0, 0, 0, 0]  # first voxel == patch start along axis 0
        l1 = jnp.where(v == 0, l1_hi, l1_lo)
        l1 = jnp.broadcast_to(l1[:, None, None, None], patches.shape[:-1])
        return jnp.stack([jnp.zeros_like(l1), l1], axis=-1)

    vol = np.broadcast_to(
        np.arange(8, dtype=np.float32)[:, None, None, None],
        (8, 4, 4, 1)).copy()

    hard_eng = SlidingWindowInference(apply_fn, (4, 4, 4), (2, 4, 4),
                                      batch_size=3, num_classes=2,
                                      hard_accumulate=True)
    acc, weight = hard_eng({}, vol)
    acc, weight = np.asarray(acc), np.asarray(weight)
    assert acc.shape == (8, 4, 4, 3)  # [pred_sum, softmax0, softmax1]
    hard_label = np.rint(acc[..., 0] / weight + 0.01).astype(np.uint8)
    soft_label = np.argmax(acc[..., 1:], axis=-1).astype(np.uint8)

    np.testing.assert_array_equal(hard_label[0:2], 1)  # single visit, pred 1
    np.testing.assert_array_equal(hard_label[2:4], 1)  # (1+0)/2 + .01 -> 1
    np.testing.assert_array_equal(hard_label[4:8], 0)
    np.testing.assert_array_equal(soft_label[2:4], 0)  # modes disagree here
    # softmax channels are still a valid distribution after weighting
    np.testing.assert_allclose(
        (acc[..., 1] + acc[..., 2]) / weight, 1.0, atol=1e-5)


@pytest.mark.parametrize("gaussian_blend,hard", [(False, False),
                                                 (True, False),
                                                 (False, True)])
def test_pallas_blend_matches_xla(rng, gaussian_blend, hard):
    """blend_impl='pallas' is an exact rewrite of the XLA scatter-add
    (same math, weight rides as an accumulator channel)."""
    def apply_fn(variables, patches):
        v = patches[..., 0]
        return jnp.stack([jnp.sin(v), jnp.cos(v)], axis=-1)

    vol = rng.normal(size=(10, 9, 8, 1)).astype(np.float32)
    kw = dict(patch_shape=(4, 4, 4), stride=(3, 3, 3), batch_size=3,
              num_classes=2, gaussian_blend=gaussian_blend,
              hard_accumulate=hard)
    ref_acc, ref_w = SlidingWindowInference(apply_fn, **kw)({}, vol)
    got_acc, got_w = SlidingWindowInference(apply_fn, blend_impl="pallas",
                                            **kw)({}, vol)
    np.testing.assert_allclose(np.asarray(got_acc), np.asarray(ref_acc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-6)


def test_pallas_blend_eligibility_predicate():
    """Mosaic f32 tiling (8, 128): minor starts/extents x folded channels
    must be 128-multiples, second-minor 8-multiples (the LiTS rehearsal
    rejection: stride-16 grid x Cc=4 -> folded minor gcd 64)."""
    from vnet_tpu.infer.sliding_window import pallas_blend_eligible
    # the measured-win bench geometry (benchmark_eval.py defaults):
    # patch 64^3, stride 64, 3 classes + weight channel
    assert pallas_blend_eligible((64, 64, 64), (64, 64, 64), 4)
    # LiTS rehearsal geometry: minor stride gcd 16, Cc=4 -> 64 < 128
    assert not pallas_blend_eligible((16, 16, 16), (256, 256, 32), 4)
    # sublane violation: second-minor starts not 8-aligned
    assert not pallas_blend_eligible((64, 4, 64), (64, 64, 64), 4)
    # single-patch axes use the huge power-of-two sentinel -> eligible
    assert pallas_blend_eligible((1 << 20, 1 << 20, 1 << 20), (64, 64, 64), 4)
    # odd folded channel count is fine when stride covers it (32*4=128)
    assert pallas_blend_eligible((8, 8, 32), (8, 8, 32), 4)
    assert not pallas_blend_eligible((8, 8, 32), (8, 8, 32), 3)


def test_pallas_blend_ineligible_grid_falls_back(rng, monkeypatch):
    """With a real-TPU backend and a grid Mosaic cannot prove tile-aligned,
    blend_impl='pallas' must route THAT volume through the XLA scatter-add
    instead of tracing the kernel (which dies in the remote compile
    helper — the round-5 LiTS rehearsal failure)."""
    import vnet_tpu.ops.pallas as vp

    def apply_fn(variables, patches):
        v = patches[..., 0]
        return jnp.stack([jnp.sin(v), jnp.cos(v)], axis=-1)

    vol = rng.normal(size=(10, 9, 8, 1)).astype(np.float32)
    kw = dict(patch_shape=(4, 4, 4), stride=(3, 3, 3), batch_size=3,
              num_classes=2)
    ref_acc, ref_w = SlidingWindowInference(apply_fn, **kw)({}, vol)

    monkeypatch.setattr(vp, "is_tpu_backend", lambda: True)
    eng = SlidingWindowInference(apply_fn, blend_impl="pallas", **kw)
    got_acc, got_w = eng({}, vol)
    # stride 3 is neither 8- nor (x Cc=3) 128-aligned -> xla fallback
    assert all(key[-1] == "xla" for key in eng._compiled)
    np.testing.assert_allclose(np.asarray(got_acc), np.asarray(ref_acc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w),
                               rtol=1e-5, atol=1e-6)


def test_pallas_blend_rejects_mesh():
    with pytest.raises(NotImplementedError):
        SlidingWindowInference(lambda v, p: p, (4, 4, 4), (4, 4, 4),
                               batch_size=1, num_classes=2,
                               mesh=object(), blend_impl="pallas")


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick


def _apply2d(variables, patches):
    v = patches[..., 0]
    return jnp.stack([jnp.zeros_like(v), v * 0.5, -v], axis=-1)


@pytest.mark.parametrize("gaussian_blend", [False, True])
def test_slice_stacked_matches_per_slice(rng, gaussian_blend):
    """slice_stacked runs the whole (Z, H, W, C) stack in one dispatch and
    must equal looping the plain 2D engine over the slices."""
    vol = rng.normal(size=(5, 10, 8, 1)).astype(np.float32)
    loop = SlidingWindowInference(_apply2d, (4, 4), (3, 2), batch_size=3,
                                  num_classes=3,
                                  gaussian_blend=gaussian_blend)
    stacked = SlidingWindowInference(_apply2d, (4, 4), (3, 2), batch_size=3,
                                     num_classes=3,
                                     gaussian_blend=gaussian_blend,
                                     slice_stacked=True)
    acc_s, w_s = stacked({}, vol)
    acc_s, w_s = np.asarray(acc_s), np.asarray(w_s)
    assert acc_s.shape == (5, 10, 8, 3) and w_s.shape == (5, 10, 8)
    for z in range(vol.shape[0]):
        acc_z, w_z = loop({}, vol[z])
        # padded duplicate tail patches differ between the grids; compare
        # the normalized blends
        np.testing.assert_allclose(
            acc_s[z] / w_s[z][..., None],
            np.asarray(acc_z) / np.asarray(w_z)[..., None], rtol=1e-5,
            atol=1e-6)


def test_slice_stacked_sharded_matches_single():
    from vnet_tpu.parallel import make_mesh
    rng = np.random.default_rng(7)
    vol = rng.normal(size=(3, 8, 8, 1)).astype(np.float32)
    single = SlidingWindowInference(_apply2d, (4, 4), (2, 2), batch_size=2,
                                    num_classes=3, slice_stacked=True)
    acc_1, w_1 = single({}, vol)
    mesh = make_mesh(8, 1)
    sharded = SlidingWindowInference(_apply2d, (4, 4), (2, 2), batch_size=2,
                                     num_classes=3, mesh=mesh,
                                     slice_stacked=True)
    acc_m, w_m = sharded({}, vol)
    np.testing.assert_allclose(
        np.asarray(acc_m) / np.asarray(w_m)[..., None],
        np.asarray(acc_1) / np.asarray(w_1)[..., None], rtol=1e-4)


def test_slice_stacked_rejects_bad_configs():
    with pytest.raises(ValueError, match="2D patch"):
        SlidingWindowInference(_apply2d, (4, 4, 4), (2, 2, 2), 2, 2,
                               slice_stacked=True)
    with pytest.raises(ValueError, match="hard_accumulate"):
        SlidingWindowInference(_apply2d, (4, 4), (2, 2), 2, 2,
                               slice_stacked=True, hard_accumulate=True)
    with pytest.raises(NotImplementedError):
        SlidingWindowInference(_apply2d, (4, 4), (2, 2), 2, 2,
                               slice_stacked=True, blend_impl="pallas")


def _numpy_oracle(vol, patch, stride, window, stacked):
    """Naive host blend for the identity-ish _apply2d/_apply3d nets."""
    import itertools

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    spatial = vol.shape[1:-1] if stacked else vol.shape[:-1]
    axes = [patch_starts_1d(spatial[i], patch[i], stride[i])
            for i in range(len(patch))]
    nc = 3
    acc = np.zeros(vol.shape[:-1] + (nc,), np.float32)
    w = np.zeros(vol.shape[:-1], np.float32)
    zs = range(vol.shape[0]) if stacked else [None]
    for z in zs:
        for s in itertools.product(*axes):
            sl = tuple(slice(s[i], s[i] + patch[i]) for i in range(len(s)))
            if stacked:
                sl = (z,) + sl
            v = vol[sl + (0,)]
            logits = np.stack([np.zeros_like(v), v * 0.5, -v], -1)
            acc[sl] += softmax(logits) * window[..., None]
            w[sl] += window
    return acc, w


@pytest.mark.quick
def test_blend_property_random_geometries(rng):
    """Randomized sweep: engine blend equals the numpy oracle across odd
    volume/patch/stride/batch combinations, plain and slice-stacked, with
    uniform and cosine windows (guards the zero-weight grid padding)."""
    for trial in range(8):
        stacked = bool(trial % 2)
        patch = tuple(int(rng.integers(3, 6)) for _ in range(2))
        stride = tuple(int(rng.integers(1, p + 1)) for p in patch)
        spatial = tuple(int(rng.integers(p, p + 7)) for p in patch)
        nz = int(rng.integers(2, 5))
        shape = ((nz,) + spatial + (1,)) if stacked else (spatial + (1,))
        vol = rng.normal(size=shape).astype(np.float32)
        batch = int(rng.integers(1, 6))
        gaussian = bool(rng.integers(0, 2))
        eng = SlidingWindowInference(_apply2d, patch, stride, batch,
                                     num_classes=3, gaussian_blend=gaussian,
                                     slice_stacked=stacked)
        acc, w = eng({}, vol)
        window = (cosine_window(patch) if gaussian
                  else np.ones(patch, np.float32))
        acc_ref, w_ref = _numpy_oracle(vol, patch, stride, window, stacked)
        np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-5,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(acc), acc_ref, rtol=1e-4,
                                   atol=1e-6, err_msg=f"trial {trial}")


@pytest.mark.quick
def test_slice_stacked_z_bucketing_shares_compile(rng):
    """Volumes differing only in slice count reuse ONE compiled program
    (Z padded to the bucket with zero slices + flag-0 grid rows), and
    results still equal the per-slice oracle."""
    eng = SlidingWindowInference(_apply2d, (4, 4), (2, 2), batch_size=2,
                                 num_classes=3, slice_stacked=True,
                                 z_bucket=8)
    window = np.ones((4, 4), np.float32)
    for nz in (3, 5, 8):
        vol = rng.normal(size=(nz, 6, 6, 1)).astype(np.float32)
        acc, w = eng({}, vol)
        acc, w = np.asarray(acc), np.asarray(w)
        assert acc.shape == (nz, 6, 6, 3) and w.shape == (nz, 6, 6)
        acc_ref, w_ref = _numpy_oracle(vol, (4, 4), (2, 2), window, True)
        np.testing.assert_allclose(w, w_ref, rtol=1e-5)
        np.testing.assert_allclose(acc, acc_ref, rtol=1e-4, atol=1e-6)
    assert len(eng._compiled) == 1, eng._compiled.keys()
    # a second bucket compiles once more
    vol = rng.normal(size=(9, 6, 6, 1)).astype(np.float32)
    acc, w = eng({}, vol)
    assert np.asarray(acc).shape == (9, 6, 6, 3)
    assert len(eng._compiled) == 2
