"""All shipped configs (the five BASELINE.json scenarios) parse and build
their networks."""

import glob
import os

import pytest

from vnet_tpu.config import load_config
from vnet_tpu.models import build_network

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# bench_tuning.json is bench.py's measured-winner knob file (written by
# scripts/select_bench_tuning.py), not a training config
CONFIGS = sorted(p for p in glob.glob(os.path.join(ROOT, "configs", "*.json"))
                 if os.path.basename(p) != "bench_tuning.json")


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_parses_and_builds(path):
    cfg = load_config(path)
    assert cfg.train.dimension in (2, 3)
    assert cfg.train.num_classes >= 2
    net_cfg = cfg.train.network
    name = "AttentionVNet" if net_cfg.attention else net_cfg.name
    net = build_network(name, num_classes=cfg.train.num_classes,
                        num_channels=net_cfg.num_channel,
                        num_levels=net_cfg.num_levels,
                        num_convolutions=net_cfg.num_convolutions,
                        bottom_convolutions=net_cfg.bottom_convolutions)
    assert net is not None
    # pipeline YAMLs referenced by configs must exist and parse
    from vnet_tpu.config import load_pipeline
    from vnet_tpu.data import build_pipeline
    pipe = load_pipeline(cfg.train.pipeline_path)
    transforms = build_pipeline(pipe, "train", cfg.train.dimension)
    assert transforms is not None


def test_shipped_config_count():
    assert len(CONFIGS) >= 5  # the five BASELINE scenarios + default


# module is part of the fast cross-subsystem smoke subset (CLAUDE.md: pytest -m quick)
import pytest as _pytest_quick
pytestmark = _pytest_quick.mark.quick
