"""Flagship distillation-step smoke on real TPU.

Delegates to ``bench.py --distill`` (single source of truth): the
distillation_001 student (expansion 6, remat_blocks 3) plus the frozen
true_batch_001 teacher (expansion 7) at batch-32 train steps — the
highest-memory production regime; validates the configs' HBM headroom
claims on a 16 GB chip and reports clips/s.

Run: PYTHONPATH=. python tools/distill_smoke.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import math

    from bench import measure_distill

    detail = measure_distill()
    assert math.isfinite(detail["loss_last"]), f"non-finite loss: {detail}"
    print(
        json.dumps(
            {
                "metric": "distill_train_clips_per_sec",
                "value": detail["distill_clips_per_sec"],
                **detail,
            }
        )
    )


if __name__ == "__main__":
    main()
