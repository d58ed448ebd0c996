"""Dataset + loader tests over synthetic NIfTI fixtures
(reference NiftiDataset3D.py:10-165, NiftiDataset2D.py:39-299)."""

import numpy as np
import pytest

from fixtures import make_dataset_dir
from vnet_tpu.data import (BatchLoader, NiftiDataset2D, NiftiDataset3D,
                           build_transform, remap_label)
from vnet_tpu.data.rand import seed
from vnet_tpu.io import MedicalImage


@pytest.fixture(autouse=True)
def _seed():
    seed(7)


def test_remap_label():
    lbl = MedicalImage(np.array([[[0, 1], [2, 5]]], np.uint8))
    out = remap_label(lbl, [0, 2, 5])
    # 0->0, 2->1, 5->2, unlisted 1 -> 0   (NiftiDataset3D.py:119-137)
    np.testing.assert_array_equal(out.data, [[[0, 0], [1, 2]]])


def test_dataset3d_train(tmp_path, rng):
    root, names, fnames = make_dataset_dir(str(tmp_path), "training",
                                           num_cases=2, rng=rng)
    ds = NiftiDataset3D(root, fnames, "label.nii", transforms=[], train=True,
                        labels=[0, 1])
    assert len(ds) == 2
    img, lbl = ds.get_sample(0)
    assert img.shape == (24, 24, 16, 1)
    assert img.dtype == np.float32
    assert lbl.shape == (24, 24, 16)
    assert lbl.dtype == np.int32
    assert lbl.sum() > 0


def test_dataset3d_infer_empty_label(tmp_path, rng):
    root, _, fnames = make_dataset_dir(str(tmp_path), "evaluate",
                                       num_cases=1, rng=rng)
    ds = NiftiDataset3D(root, fnames, "label.nii", train=False)
    _, lbl = ds.get_sample(0)
    assert lbl.sum() == 0


def test_dataset3d_multichannel_and_header_check(tmp_path, rng):
    root, _, fnames = make_dataset_dir(str(tmp_path), "training", num_cases=1,
                                       rng=rng, num_channels=2)
    ds = NiftiDataset3D(root, fnames, "label.nii", train=True)
    img, _ = ds.get_sample(0)
    assert img.shape[-1] == 2


def test_dataset3d_header_mismatch_raises(tmp_path, rng):
    from vnet_tpu.io import write_image
    root, names, fnames = make_dataset_dir(str(tmp_path), "training",
                                           num_cases=1, rng=rng)
    # overwrite label with wrong spacing
    bad = MedicalImage(np.zeros((24, 24, 16), np.uint8), (2.0, 2.0, 2.0))
    write_image(bad, str(tmp_path / "training" / names[0] / "label.nii"))
    ds = NiftiDataset3D(root, fnames, "label.nii", train=True)
    with pytest.raises(ValueError, match="Header info inconsistent"):
        ds.get_sample(0)


def test_dataset3d_with_transforms(tmp_path, rng):
    root, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                       num_cases=1, rng=rng)
    transforms = [
        build_transform(3, "ManualNormalization",
                        {"windowMin": 0, "windowMax": 200}),
        build_transform(3, "Padding", {"output_size": [32, 32, 32]}),
        build_transform(3, "RandomCrop",
                        {"output_size": [16, 16, 16], "drop_ratio": 1.0,
                         "min_pixel": 1}),
    ]
    ds = NiftiDataset3D(root, fnames, "label.nii", transforms=transforms,
                        train=True)
    img, lbl = ds.get_sample(0)
    assert img.shape == (16, 16, 16, 1)
    assert lbl.shape == (16, 16, 16)
    assert 0.0 <= img.min() and img.max() <= 255.0


def test_transform_error_wrapped(tmp_path, rng):
    root, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                       num_cases=1, rng=rng)

    class Boom:
        name = "Boom"

        def __call__(self, sample):
            raise RuntimeError("kaput")

    ds = NiftiDataset3D(root, fnames, "label.nii", transforms=[Boom()],
                        train=True)
    with pytest.raises(RuntimeError, match="Dataset preprocessing error"):
        ds.get_sample(0)


def test_loader_batching(tmp_path, rng):
    root, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                       num_cases=3, rng=rng)
    ds = NiftiDataset3D(root, fnames, "label.nii", train=True)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, drop_remainder=True,
                         num_workers=2, seed=0)
    batches = list(loader.epoch())
    assert len(batches) == 1  # 3 samples, batch 2, drop remainder
    img, lbl = batches[0]
    assert img.shape == (2, 24, 24, 16, 1)
    assert lbl.shape == (2, 24, 24, 16)


def test_loader_sync_equals_threaded(tmp_path, rng):
    root, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                       num_cases=2, rng=rng)
    ds = NiftiDataset3D(root, fnames, "label.nii", train=True)
    a = list(BatchLoader(ds, 2, shuffle=False, num_workers=0).epoch())
    b = list(BatchLoader(ds, 2, shuffle=False, num_workers=3).epoch())
    np.testing.assert_allclose(a[0][0], b[0][0])
    np.testing.assert_array_equal(a[0][1], b[0][1])


def test_dataset2d_inventory_and_samples(tmp_path, rng):
    root, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                       num_cases=2, rng=rng)
    ds = NiftiDataset2D(root, fnames, "label.nii", train=True,
                        labels=[0, 1], min_pixel=5, drop_ratio=0.0)
    # only slices through the sphere (radius 5 around z=8) survive
    assert 0 < len(ds) < 2 * 16
    img, lbl = ds.get_sample(0)
    assert img.shape == (24, 24, 1)
    assert lbl.shape == (24, 24)
    assert lbl.sum() > 5


def test_dataset2d_with_2d_transforms(tmp_path, rng):
    root, _, fnames = make_dataset_dir(str(tmp_path), "training",
                                       num_cases=1, rng=rng)
    t2 = [build_transform(2, "Padding", {"output_size": [32, 32]}),
          build_transform(2, "RandomCrop",
                          {"output_size": [16, 16], "drop_ratio": 1.0,
                           "min_pixel": 1})]
    ds = NiftiDataset2D(root, fnames, "label.nii", transforms2D=t2,
                        train=True, min_pixel=5, drop_ratio=0.0)
    img, lbl = ds.get_sample(0)
    assert img.shape == (16, 16, 1)
    assert lbl.shape == (16, 16)


class FlakyDataset:
    """Every odd sample index raises."""

    def __init__(self, n=6):
        self.n = n

    def __len__(self):
        return self.n

    def get_sample(self, i):
        if i % 2:
            raise RuntimeError(f"corrupt sample {i}")
        img = np.full((4, 4, 4, 1), float(i), np.float32)
        return img, np.zeros((4, 4, 4), np.int32)


@pytest.mark.parametrize("workers", [0, 2])
def test_loader_skip_errors(workers):
    loader = BatchLoader(FlakyDataset(), batch_size=1, shuffle=False,
                         num_workers=workers, skip_errors=True)
    batches = list(loader.epoch())
    assert len(batches) == 3  # 0, 2, 4 survive
    assert loader.error_count == 3


def test_loader_raises_without_skip():
    loader = BatchLoader(FlakyDataset(), batch_size=1, shuffle=False,
                         num_workers=0, skip_errors=False)
    with pytest.raises(RuntimeError, match="corrupt"):
        list(loader.epoch())


class StochasticDataset:
    """Samples mix the index with the shared transform RNG — exposes
    whether per-sample seeding makes process workers deterministic."""

    def __len__(self):
        return 4

    def get_sample(self, i):
        from vnet_tpu.data.rand import get_rng
        noise = get_rng().normal(size=(4, 4, 4, 1)).astype(np.float32)
        return noise + i, np.full((4, 4, 4), i, np.int32)


def test_loader_process_backend_matches_order():
    a = list(BatchLoader(FlakyDataset(), 1, shuffle=False, num_workers=2,
                         backend="process", skip_errors=True).epoch())
    assert len(a) == 3
    np.testing.assert_allclose([b[0][0, 0, 0, 0, 0] for b in a],
                               [0.0, 2.0, 4.0])


def test_loader_process_backend_deterministic_seeding():
    mk = lambda w: list(BatchLoader(StochasticDataset(), 2, shuffle=False,
                                    num_workers=w, backend="process",
                                    seed=7).epoch())
    a, b = mk(1), mk(3)  # same seed, different worker counts
    np.testing.assert_allclose(a[0][0], b[0][0])
    np.testing.assert_array_equal(a[0][1], b[0][1])


def test_loader_process_backend_raises_without_skip():
    loader = BatchLoader(FlakyDataset(), 1, shuffle=False, num_workers=2,
                         backend="process", skip_errors=False)
    with pytest.raises(RuntimeError, match="corrupt"):
        list(loader.epoch())


def test_loader_bad_backend():
    with pytest.raises(ValueError, match="backend"):
        BatchLoader(FlakyDataset(), 1, backend="greenlet")


def test_case_cache_is_exact(tmp_path, rng):
    """cache_cases memoizes the deterministic transform prefix; with the
    same per-sample seeds the samples must be bitwise identical to the
    uncached path."""
    from vnet_tpu.data import rand as vrand
    from vnet_tpu.data import transforms3d as T
    from vnet_tpu.data.dataset3d import NiftiDataset3D
    from fixtures import make_dataset_dir

    make_dataset_dir(str(tmp_path), "training", num_cases=2, rng=rng)
    tfms = lambda: [
        T.StatisticalNormalization(2.5),
        T.Padding([24, 24, 24]),
        T.RandomCrop([16, 16, 16], drop_ratio=1.0, min_pixel=0),
        T.RandomNoise(sigma=2.0),
    ]
    kw = dict(image_filenames=["image.nii"], label_filename="label.nii",
              train=True, labels=[0, 1])
    a = NiftiDataset3D(str(tmp_path / "training"), transforms=tfms(), **kw)
    b = NiftiDataset3D(str(tmp_path / "training"), transforms=tfms(),
                       cache_cases=2, **kw)
    assert b._n_deterministic == 2  # norm + padding cached, crop+noise not
    for i in range(2):
        for _ in range(2):  # second pass hits the cache
            vrand.seed(123 + i)
            ia, la = a.get_sample(i)
            vrand.seed(123 + i)
            ib, lb = b.get_sample(i)
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(la, lb)


def test_case_cache_is_exact_2d(tmp_path, rng):
    """NiftiDataset2D cache_cases: identical samples with/without cache."""
    from vnet_tpu.data import rand as vrand
    from vnet_tpu.data import transforms3d as T3
    from vnet_tpu.data import transforms2d as T2
    from vnet_tpu.data.dataset2d import NiftiDataset2D
    from fixtures import make_dataset_dir

    make_dataset_dir(str(tmp_path), "training", num_cases=2, rng=rng)
    t3 = lambda: [T3.StatisticalNormalization(2.5),
                  T3.Padding([24, 24, 16])]
    t2 = lambda: [T2.Padding([24, 24]),
                  T2.RandomCrop([16, 16], drop_ratio=1.0, min_pixel=0)]
    kw = dict(image_filenames=["image.nii"], label_filename="label.nii",
              train=True, labels=[0, 1], min_pixel=0, drop_ratio=1.0)
    vrand.seed(7)
    a = NiftiDataset2D(str(tmp_path / "training"), transforms3D=t3(),
                       transforms2D=t2(), **kw)
    vrand.seed(7)
    b = NiftiDataset2D(str(tmp_path / "training"), transforms3D=t3(),
                       transforms2D=t2(), cache_cases=2, **kw)
    assert b._n_det3d == 2
    assert a.slices == b.slices
    for i in range(min(4, len(a.slices))):
        for _ in range(2):
            vrand.seed(55 + i)
            ia, la = a.get_sample(i)
            vrand.seed(55 + i)
            ib, lb = b.get_sample(i)
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(la, lb)


def test_case_cache_2d_engages_without_3d_transforms(tmp_path, rng):
    """Regression: the rank2 quality pipeline has transforms3D=[] and the
    old gate (`cache_cases > 0 and _n_det3d > 0`) bypassed the cache
    entirely — every slice sample re-decoded the whole 3D volume. The
    cache must engage (one decode per case), samples must match the
    uncached path, and in-place 2D transforms must not corrupt the
    shared read-only cache entry."""
    from vnet_tpu.data import rand as vrand
    from vnet_tpu.data import transforms2d as T2
    from vnet_tpu.data.dataset2d import NiftiDataset2D
    from fixtures import make_dataset_dir

    make_dataset_dir(str(tmp_path), "training", num_cases=2, rng=rng)
    t2 = lambda: [T2.ManualNormalization(0, 200),
                  T2.Padding([24, 24]),
                  T2.RandomFlip()]
    kw = dict(image_filenames=["image.nii"], label_filename="label.nii",
              train=True, labels=[0, 1], min_pixel=0, drop_ratio=1.0)
    vrand.seed(7)
    a = NiftiDataset2D(str(tmp_path / "training"), transforms3D=[],
                       transforms2D=t2(), **kw)
    vrand.seed(7)
    b = NiftiDataset2D(str(tmp_path / "training"), transforms3D=[],
                       transforms2D=t2(), cache_cases=2, **kw)
    assert b._n_det3d == 0
    loads = []
    orig = NiftiDataset2D._load_case
    b._load_case = lambda case: (loads.append(case), orig(b, case))[1]
    for i in range(min(8, len(a.slices))):
        for _ in range(2):  # second pass must hit the cache
            vrand.seed(55 + i)
            ia, la = a.get_sample(i)
            vrand.seed(55 + i)
            ib, lb = b.get_sample(i)
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(la, lb)
    assert sorted(set(loads)) == sorted(loads)  # one decode per case


def test_case_cache_thread_safe_under_eviction(tmp_path, rng):
    """Thread-backend loaders call get_sample concurrently; with
    cache_cases < num_cases every fetch races insert/evict/move_to_end on
    the shared LRU. Must neither raise nor corrupt samples."""
    import threading

    from vnet_tpu.data import transforms3d as T
    from vnet_tpu.data.dataset3d import NiftiDataset3D
    from fixtures import make_dataset_dir

    make_dataset_dir(str(tmp_path), "training", num_cases=4, rng=rng)
    kw = dict(image_filenames=["image.nii"], label_filename="label.nii",
              train=True, labels=[0, 1])
    tfms = lambda: [T.StatisticalNormalization(2.5), T.Padding([24, 24, 24])]
    ds = NiftiDataset3D(str(tmp_path / "training"), transforms=tfms(),
                        cache_cases=2, **kw)  # evicts constantly
    ref = NiftiDataset3D(str(tmp_path / "training"), transforms=tfms(), **kw)
    expected = [ref.get_sample(i) for i in range(4)]

    errors = []

    def hammer():
        try:
            for _ in range(8):
                for i in range(4):
                    img, lbl = ds.get_sample(i)
                    np.testing.assert_array_equal(img, expected[i][0])
                    np.testing.assert_array_equal(lbl, expected[i][1])
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(ds._prefix_cache) <= 2


def test_warm_cache_prefills_cc_memo(tmp_path, rng):
    """warm_cache also warms the ConfidenceCrop2 CC memo (module-level,
    so per-epoch forked workers inherit it copy-on-write)."""
    from vnet_tpu.data import transforms3d as T
    from vnet_tpu.data.transforms3d import _cc_objs_memo, _label_digest
    from vnet_tpu.data.dataset3d import NiftiDataset3D
    from fixtures import make_dataset_dir

    make_dataset_dir(str(tmp_path), "training", num_cases=2, rng=rng)
    ds = NiftiDataset3D(
        str(tmp_path / "training"), ["image.nii"], "label.nii",
        transforms=[T.Padding([24, 24, 24]),
                    T.ConfidenceCrop2([16, 16, 16], rand_range=2,
                                      probability=1.0)],
        train=True, labels=[0, 1], cache_cases=2)
    ds.warm_cache()
    assert len(ds._prefix_cache) == 2
    for sample in ds._prefix_cache.values():
        assert _label_digest(sample["label"].data >= 1) in _cc_objs_memo


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
