"""Export a trained checkpoint as a frozen StableHLO forward — the
meta_to_pb.py analog (`/root/reference/meta_to_pb.py:8-28`).

    python scripts/export_model.py --config_json configs/config.json \
        --out model_forward.stablehlo --batch 8
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_json", required=True)
    p.add_argument("--out", default="model_forward.stablehlo")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--text", action="store_true",
                   help="also write human-readable MLIR next to --out")
    args = p.parse_args()

    from vnet_tpu.config import load_config
    from vnet_tpu.export import (export_forward, export_stablehlo_bytecode,
                                 stablehlo_text)
    from vnet_tpu.infer import Evaluator

    config = load_config(args.config_json)
    ev = Evaluator(config)  # restores weights from the checkpoint dir
    t = config.train
    input_shape = (args.batch, *t.patch_shape, t.input_channels)

    # raw StableHLO bytecode: what the native PJRT client compiles
    blob = export_stablehlo_bytecode(ev.network, ev.variables, input_shape,
                                     path=args.out,
                                     is_attention=ev.is_attention)
    print(f"wrote {len(blob)} bytes (StableHLO bytecode) to {args.out}")
    # jax.export container: re-importable in JAX via load_exported()
    jx = export_forward(ev.network, ev.variables, input_shape,
                        path=args.out + ".jax", is_attention=ev.is_attention)
    print(f"wrote {len(jx)} bytes (jax.export) to {args.out}.jax")
    if args.text:
        text = stablehlo_text(ev.network, ev.variables, input_shape,
                              is_attention=ev.is_attention)
        with open(args.out + ".mlir", "w") as f:
            f.write(text)
        print(f"wrote MLIR to {args.out}.mlir")


if __name__ == "__main__":
    main()
