"""Hardware smoke config: the exact ``true_batch_001`` production model and
optimization recipe, shrunk to a handful of steps.

Use with a synthetic dataset (``tools/make_synth_data.py``) to validate the
full CLI path — loader -> sharding -> jitted train step -> EMA checkpoint ->
correlation metric — on real hardware in minutes instead of hours:

    python tools/make_synth_data.py /tmp/smoke_data
    SENSORIUM_DATA_DIR=/tmp/smoke_data SENSORIUM_FOLD_ASSIGNMENT=trial \
        python scripts/train.py -e smoke_001 -f 0
"""

from importlib.machinery import SourceFileLoader
from pathlib import Path

_base = SourceFileLoader(
    "true_batch_001", str(Path(__file__).resolve().parent / "true_batch_001.py")
).load_module().config

config = dict(_base)
config["train_epoch_size"] = 64
config["num_epochs"] = [1, 1]
