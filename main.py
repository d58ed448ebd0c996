"""vnet_tpu CLI — train / evaluate, config-compatible with the reference.

Usage parity with `/root/reference/main.py:13-58`:

    python main.py -p train --config_json configs/config.json
    python main.py -p evaluate --config_json configs/config.json

``--gpu`` is accepted for compatibility but device selection on TPU comes
from the JAX runtime; use ``--devices N`` to restrict the mesh size.
"""

from __future__ import annotations

import argparse
import os
import sys


def get_parser():
    parser = argparse.ArgumentParser(description="TPU-native V-Net framework")
    parser.add_argument(
        "-v", "--verbose", dest="verbose", action="store_true",
        help="show debug output")
    parser.add_argument(
        "-p", "--phase", dest="phase", default="train",
        choices=["train", "evaluate"],
        help="training phase or evaluation phase")
    parser.add_argument(
        "--config_json", dest="config_json", default="configs/config.json",
        metavar="FILENAME", help="JSON file for model configuration")
    parser.add_argument(
        "--gpu", dest="gpu", default="",
        help="accepted for reference compatibility; ignored on TPU")
    parser.add_argument(
        "--devices", dest="devices", type=int, default=0,
        help="number of devices for the data-parallel mesh (0 = all)")
    parser.add_argument(
        "--profile_dir", dest="profile_dir", default="",
        help="capture a jax.profiler trace into this directory")
    return parser


def main(args):
    from vnet_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    from vnet_tpu.config import load_config

    config = load_config(args.config_json)
    if args.devices:
        config.train.mesh_data_parallel = args.devices

    profiler = None
    if args.profile_dir:
        from vnet_tpu.profiler import TraceCapture
        profiler = TraceCapture(args.profile_dir)
        profiler.start()

    try:
        if args.phase == "train":
            from vnet_tpu.train import Trainer
            Trainer(config).train()
        elif args.phase == "evaluate":
            from vnet_tpu.infer import Evaluator
            Evaluator(config).evaluate()
        else:
            sys.exit("Invalid training phase")
    finally:
        if profiler is not None:
            profiler.stop()


if __name__ == "__main__":
    parser = get_parser()
    main(parser.parse_args())
