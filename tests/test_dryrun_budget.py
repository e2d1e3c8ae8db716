"""Release gate: the driver-default multichip dryrun stays inside budget.

The round-3 driver run died on a watchdog because nothing watched the
dryrun's cold wall-clock (VERDICT r03): the then-default geometry cost
~13 min cold on this 1-core host.  This gate runs the EXACT driver
invocation (``__graft_entry__.dryrun_multichip(8)``) against a fresh
persistent-cache dir and fails if it exceeds the budget — so a geometry,
remat or sharding change that regresses the cold compile+execute time
trips a test instead of a driver timeout.

Budget: 300 s (the ~5 min driver allowance) on an idle 1-core host —
measured 141 s cold in MULTICHIP_COLD_r04.json, 216 s at the round-5 code
state (MULTICHIP_COLD_r05.json: the shard_map dw-wgrad + shifted-variance
BN cost extra virtual-CPU compile+execute); override with
``SENSORIUM_DRYRUN_BUDGET_S`` when running under concurrent load.
"""

from __future__ import annotations

import os

import pytest

from tools.dryrun_cold import run_once


@pytest.mark.slow
def test_driver_default_dryrun_within_cold_budget(tmp_path):
    budget_s = float(os.environ.get("SENSORIUM_DRYRUN_BUDGET_S", "300"))
    cache_dir = tmp_path / "xla_cache"
    cache_dir.mkdir()
    result = run_once(8, str(cache_dir), "cold (gate)")
    assert result["ok"], result
    assert result["wall_s"] < budget_s, (
        f"driver-default dryrun took {result['wall_s']}s cold (> {budget_s}s "
        f"budget) — the driver watchdog would be at risk; see "
        f"MULTICHIP_COLD_r04.json and tools/dryrun_cold.py"
    )
