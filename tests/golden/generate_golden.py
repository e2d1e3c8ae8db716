"""Generate golden parity fixtures from the PyTorch reference implementation.

Run in an environment where the reference repo is available (read-only) at
``/root/reference``.  The produced ``dwiseneuro_small.npz`` captures, for a
small DwiseNeuro configuration:

* the reference-initialized torch state dict (flattened),
* an eval-mode forward (running BN stats),
* a train-mode forward (batch BN stats) and the post-forward state dict
  (to check running-stat updates),
* a single-mouse (index=1) eval forward.

The committed fixture lets the test suite verify bit-level behavioral
parity without needing torch's reference code at test time.
"""

import sys
from pathlib import Path

import numpy as np

REFERENCE = "/root/reference"
OUT = Path(__file__).parent / "dwiseneuro_small.npz"

SMALL_CFG = dict(
    readout_outputs=(11, 7, 10),
    in_channels=5,
    core_features=(8, 12),
    spatial_strides=(2, 1),
    spatial_kernel=3,
    temporal_kernel=5,
    expansion_ratio=2,
    se_reduce_ratio=4,
    cortex_features=(16, 24),
    groups=2,
    softplus_beta=0.07,
    drop_rate=0.0,
    drop_path_rate=0.0,
)


def flatten_state_dict(sd, prefix):
    return {
        f"{prefix}:{k}": v.detach().cpu().numpy().astype(np.float32)
        for k, v in sd.items()
        if v is not None and v.dtype.is_floating_point
    }


def load_reference_module(name: str, rel_path: str):
    """Load a reference file directly (src/__init__ pulls in unavailable deps)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, f"{REFERENCE}/{rel_path}")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def main():
    import torch

    sys.path.insert(0, REFERENCE)
    TorchDwiseNeuro = load_reference_module(
        "ref_dwiseneuro", "src/models/dwiseneuro.py"
    ).DwiseNeuro
    init_weights = load_reference_module("ref_utils", "src/utils.py").init_weights

    torch.manual_seed(0)
    model = TorchDwiseNeuro(**SMALL_CFG)
    init_weights(model)

    rng = np.random.default_rng(1)
    x = (rng.normal(size=(2, 5, 8, 16, 16)) * 2.0).astype(np.float32)
    xt = torch.from_numpy(x)

    payload = {"input": x}
    payload.update(flatten_state_dict(model.state_dict(), "sd0"))

    model.eval()
    with torch.no_grad():
        outs_eval = model(xt)
        out_mouse1 = model(xt, 1)
    for m, out in enumerate(outs_eval):
        payload[f"eval_out:{m}"] = out.numpy()
    payload["eval_mouse1"] = out_mouse1.numpy()

    model.train()
    with torch.no_grad():
        outs_train = model(xt)
    for m, out in enumerate(outs_train):
        payload[f"train_out:{m}"] = out.numpy()
    payload.update(flatten_state_dict(model.state_dict(), "sd1"))

    np.savez_compressed(OUT, **payload)
    print(f"Wrote {OUT} ({OUT.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
