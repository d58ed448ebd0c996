"""End-to-end evaluation tests: train briefly, then run the full
evaluate() path with header restore (reference model.py:1131-1243)."""

import os

import numpy as np
import pytest

from fixtures import make_dataset_dir
from test_trainer import write_config
from vnet_tpu.config import load_config
from vnet_tpu.infer import Evaluator
from vnet_tpu.io import read_image
from vnet_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("eval")
    rng = np.random.default_rng(5)
    cpath = write_config(tmp_path, rng, max_iterations=2)
    cfg = load_config(cpath)
    make_dataset_dir(str(tmp_path), "evaluate", num_cases=1, rng=rng)
    trainer = Trainer(cfg, log=False)
    state = trainer.train()
    return cfg, state, tmp_path


def test_evaluate_writes_label(trained):
    cfg, state, tmp_path = trained
    ev = Evaluator(cfg, state=state)
    results = ev.evaluate()
    assert len(results) == 1
    out = read_image(results[0])
    src = read_image(str(tmp_path / "evaluate" / "case_0" / "image.nii"))
    # label restored onto the ORIGINAL grid (model.py:957-966)
    assert out.GetSize() == src.GetSize()
    np.testing.assert_allclose(out.spacing, src.spacing, atol=1e-4)
    assert set(np.unique(out.data)) <= {0, 1}


def test_evaluate_probability_output(trained):
    cfg, state, tmp_path = trained
    cfg.evaluate.probability_output = True
    ev = Evaluator(cfg, state=state)
    ev.evaluate()
    case = tmp_path / "evaluate" / "case_0"
    # per-class files named probability_<classid>.nii.gz (model.py:1234-1242)
    p0 = read_image(str(case / "probability_0.nii.gz"))
    p1 = read_image(str(case / "probability_1.nii.gz"))
    s = p0.data + p1.data
    interior = s[2:-2, 2:-2, 2:-2]  # borders touched by resample padding
    np.testing.assert_allclose(interior, 1.0, atol=1e-3)
    cfg.evaluate.probability_output = False


def test_evaluate_restores_from_checkpoint_dir(trained):
    cfg, _state, tmp_path = trained
    cfg.evaluate.checkpoint_path = cfg.train.ckpt_dir
    ev = Evaluator(cfg)  # no state passed: restore from disk
    results = ev.evaluate()
    assert results


def test_evaluate_with_postprocess(trained):
    cfg, state, _ = trained
    cfg.evaluate.largest_connected_component = True
    cfg.evaluate.volume_threshold = 1.0
    ev = Evaluator(cfg, state=state)
    results = ev.evaluate()
    out = read_image(results[0])
    assert set(np.unique(out.data)) <= {0, 1}
    cfg.evaluate.largest_connected_component = False
    cfg.evaluate.volume_threshold = 0.0


def test_evaluate_missing_case_skipped(trained, tmp_path):
    cfg, state, root = trained
    os.makedirs(root / "evaluate" / "case_missing", exist_ok=True)
    ev = Evaluator(cfg, state=state)
    results = ev.evaluate()  # must not raise
    assert all("case_missing" not in r for r in results)


def test_evaluate_average_hard_mode(trained):
    """LabelMode=average_hard runs the legacy hard-prediction averaging
    path (`/root/reference/evaluate.py:264-271`) end to end."""
    cfg, state, tmp_path = trained
    cfg.evaluate.label_mode = "average_hard"
    ev = Evaluator(cfg, state=state)
    results = ev.evaluate()
    out = read_image(results[0])
    assert set(np.unique(out.data)) <= {0, 1}
    cfg.evaluate.label_mode = "argmax"


def test_evaluate_prob_map_masking(trained):
    """MaskProbabilityWithLabel + VolumeThreshold zeroes the probability
    map where the thresholded label is nonzero (MaskNegatedImageFilter,
    `/root/reference/evaluate.py:316-323`)."""
    cfg, state, tmp_path = trained
    cfg.evaluate.probability_output = True
    cfg.evaluate.volume_threshold = 1e-6  # keep everything, enable masking
    cfg.evaluate.mask_probability_with_label = True
    ev = Evaluator(cfg, state=state)
    results = ev.evaluate()
    label = read_image(results[0])
    case = tmp_path / "evaluate" / "case_0"
    p1 = read_image(str(case / "probability_1.nii.gz"))
    inside = np.asarray(label.data) != 0
    assert np.all(np.asarray(p1.data)[inside] == 0.0)
    cfg.evaluate.probability_output = False
    cfg.evaluate.volume_threshold = 0.0
    cfg.evaluate.mask_probability_with_label = False


def test_blend_impl_auto_sharded_resolves_to_xla(trained):
    """BlendImpl 'auto' (the default) picks the XLA scatter-add whenever
    the patch grid is sharded over >1 device (the pallas kernel is an
    unsharded-3D-volume kernel)."""
    cfg, state, _ = trained
    assert cfg.evaluate.blend_impl == "auto"
    ev = Evaluator(cfg, state=state)
    assert ev.engine.blend_impl == "xla"


def test_blend_impl_auto_unsharded_resolves_to_pallas(trained, monkeypatch):
    """On a single device, 'auto' picks the pallas blend (measured 14%
    faster at dense stride, BENCHMARKS.md) — and evaluation still produces
    a valid label end to end (interpret mode on CPU)."""
    import jax

    cfg, state, _ = trained
    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [dev0])
    ev = Evaluator(cfg, state=state)
    assert ev.engine.blend_impl == "pallas"
    results = ev.evaluate()
    out = read_image(results[0])
    assert set(np.unique(out.data)) <= {0, 1}


def test_blend_impl_pallas_sharded_warns_and_falls_back(trained):
    """An EXPLICIT BlendImpl 'pallas' on a sharded grid must not be
    silently rewritten: a warning is raised and the XLA blend is used
    (round-3 verdict item 3)."""
    cfg, state, _ = trained
    cfg.evaluate.blend_impl = "pallas"
    try:
        with pytest.warns(UserWarning, match="falling back"):
            ev = Evaluator(cfg, state=state)
        assert ev.engine.blend_impl == "xla"
    finally:
        cfg.evaluate.blend_impl = "auto"


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
