"""Thin wrapper for CLI parity with the reference repo's scripts/ layout."""

from sensorium_tpu.cli.train import main

if __name__ == "__main__":
    main()
