"""Import reference PyTorch checkpoints — ``python -m
sensorium_tpu.cli.import_torch IN.pth OUT.ckpt``.

The reference publishes 9.5 GB of trained weights as argus checkpoints
(``{model_name, params, nn_state_dict}``, ``/root/reference/src/ema.py:
61-73``).  This CLI converts one into this framework's inference
checkpoint so the published models can be served from TPU without
retraining.  The converted file plugs directly into ``Predictor`` /
``sensorium_tpu.cli.predict``.

Requires torch (CPU build is enough) to deserialize the ``.pth``.
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", type=Path, help="reference .pth checkpoint")
    parser.add_argument("output", type=Path, help="output .ckpt path")
    parser.add_argument(
        "--dtype", default=None, choices=["bfloat16", "float32"],
        help="compute dtype recorded in the converted config "
             "(default: the model default, bfloat16 — use float32 to serve on CPU)",
    )
    return parser.parse_args()


def convert_checkpoint(input_path: Path, output_path: Path, dtype: str | None = None) -> dict:
    import torch

    from sensorium_tpu.compat import convert_torch_state_dict
    from sensorium_tpu.engine.checkpoint import save_model_checkpoint
    from sensorium_tpu.models.registry import get_nn_module

    payload = torch.load(input_path, map_location="cpu", weights_only=False)
    argus_params = payload["params"]
    nn_name, nn_kwargs = argus_params["nn_module"]
    if dtype is not None:
        nn_kwargs = dict(nn_kwargs, dtype=dtype)
        argus_params = dict(argus_params, nn_module=(nn_name, nn_kwargs))
    state_dict = payload["nn_state_dict"]

    module = get_nn_module(nn_name, nn_kwargs)
    num_core_blocks = len(nn_kwargs["core_features"])
    num_cortex_layers = len(nn_kwargs["cortex_features"])
    groups = nn_kwargs.get("groups", 1)
    params, batch_stats = convert_torch_state_dict(
        state_dict,
        readout_outputs=list(nn_kwargs["readout_outputs"]),
        num_core_blocks=num_core_blocks,
        num_cortex_layers=num_cortex_layers,
        groups=groups,
        padded_group_size=module.padded_group_size,
    )
    output_path.parent.mkdir(parents=True, exist_ok=True)
    save_model_checkpoint(
        output_path, argus_params, {"params": params, "batch_stats": batch_stats}
    )
    total = sum(math.prod(v.shape) for v in state_dict.values())
    print(f"Converted {input_path} ({total / 1e6:.1f}M torch values) -> {output_path}")
    return argus_params


def main():
    args = parse_arguments()
    convert_checkpoint(args.input, args.output, dtype=args.dtype)


if __name__ == "__main__":
    main()
