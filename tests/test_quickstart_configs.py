"""quickstart.py config/pipeline generation must be loadable end-to-end.

The round-4 revival queue lost its first pass because the rank2+augment
pipeline emitted a 3D-style ``RandomFlip {axes: [...]}`` entry that the
2D registry rejects (2D RandomFlip is parameterless — independent LR/UD
flips, `NiftiDataset2D.py:534-569`). Every mode combination quickstart
can emit must (a) parse via `load_config` and (b) build every pipeline
section through the transform registry — the exact surfaces the Trainer
touches before the first step.
"""

import importlib.util
import itertools
import os
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_quickstart():
    spec = importlib.util.spec_from_file_location(
        "quickstart", os.path.join(REPO, "scripts", "quickstart.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["quickstart"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.quick
@pytest.mark.parametrize(
    "rank2,augment,multimodal,small",
    [p for p in itertools.product([False, True], repeat=4)
     if not (p[0] and p[2])],  # --rank2 --multimodal isn't a shipped mode
)
def test_quickstart_config_builds(tmp_path, rank2, augment, multimodal,
                                  small):
    from vnet_tpu.config import load_config
    from vnet_tpu.data.registry import build_transform_list

    qs = _load_quickstart()
    if rank2:
        patch = (48, 48) if small else (96, 96)
    else:
        patch = (32, 32, 32) if small else (64, 64, 64)
    cpath = qs.write_config(str(tmp_path), patch, steps=10, small=small,
                            augment=augment, multimodal=multimodal)

    cfg = load_config(cpath)
    assert cfg.train.max_iterations == 10
    n_ch = 2 if multimodal else 1
    assert len(cfg.train.image_filenames) == n_ch

    with open(os.path.join(tmp_path, "pipeline.yaml")) as f:
        pipeline = yaml.safe_load(f)
    built = 0
    for phase, sections in pipeline["preprocess"].items():
        for dim_key, entries in sections.items():
            dim = 2 if dim_key == "2D" else 3
            tfms = build_transform_list(dim, entries)
            built += len(tfms)
            if entries:
                assert len(tfms) == len(entries), (phase, dim_key)
    assert built > 0
    if augment:
        names = [e["name"] for s in pipeline["preprocess"].values()
                 for entries in s.values() for e in (entries or [])]
        assert "RandomFlip" in names
