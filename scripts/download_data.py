"""Thin wrapper for CLI parity with the reference repo's scripts/ layout.

Works uninstalled (python scripts/download_data.py from a checkout): the repo
root is prepended to sys.path because python scripts/x.py puts
scripts/, not the root, on the path.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sensorium_tpu.cli.download_data import main  # noqa: E402

if __name__ == "__main__":
    main()
