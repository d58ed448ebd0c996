"""Round-3 A/B harness invariants (scripts/experiments/ab_train.py).

The TPU measurement queue relies on three properties that must not
regress: (1) tags already recorded in the log are skipped, so the retry
loop re-runs only the missing variants; (2) chunked host->device staging
is value-identical to a single device_put (the tunnel's ~128 MB request
limit forces chunking at b128); (3) every landable tag maps to bench.py
tuning knobs consistently with what the harness actually measured."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ab_train = _load("ab_train_mod", "scripts/experiments/ab_train.py")
selector = _load("select_tuning_mod", "scripts/select_bench_tuning.py")


@pytest.mark.quick
def test_logged_tags_skip(tmp_path):
    log = tmp_path / "exp.log"
    log.write_text(
        json.dumps({"exp": "base_b96_k4", "patches_per_s": 200.0}) + "\n"
        + "garbage line\n"
        + json.dumps({"exp": "cdw_b96_k4", "patches_per_s": 201.0}) + "\n")
    tags = ab_train._logged_tags(str(log))
    assert tags == {"base_b96_k4", "cdw_b96_k4"}
    assert ab_train._logged_tags(str(tmp_path / "missing.log")) == set()


@pytest.mark.quick
def test_device_put_chunked_matches_single_transfer():
    arr = np.random.default_rng(0).normal(size=(7, 5, 3)).astype(np.float32)
    out = ab_train._device_put_chunked(arr, max_bytes=arr[0:1].nbytes * 2)
    np.testing.assert_array_equal(np.asarray(out), arr)
    # degenerate: one row bigger than max_bytes still transfers row-wise
    out1 = ab_train._device_put_chunked(arr, max_bytes=1)
    np.testing.assert_array_equal(np.asarray(out1), arr)
    # no chunking needed
    out2 = ab_train._device_put_chunked(arr, max_bytes=arr.nbytes + 1)
    np.testing.assert_array_equal(np.asarray(out2), arr)


@pytest.mark.quick
def test_selector_tags_consistent_with_harness():
    for tag, tuning in selector.TAG_TO_TUNING.items():
        assert tag in ab_train.VARIANTS, tag
        v = ab_train.VARIANTS[tag]
        assert tuning.get("batch", 96) == v["batch"], tag
        assert tuning.get("scan", 4) == v["scan"], tag
        assert tuning.get("dropout_impl", "xla") == v["impl"], tag
        assert tuning.get("opt", "adam") == v["opt"], tag
        assert tuning.get("dw_impl", "xla") == v["dw"], tag
    # the diagnostic bound must never be landable
    assert "nodrop_b96_k4" not in selector.TAG_TO_TUNING
    # every harness variant except diagnostics/smoke is selectable
    for tag in ab_train.VARIANTS:
        assert (tag in selector.TAG_TO_TUNING or tag.startswith("nodrop")
                or tag.startswith("smoke")), tag
