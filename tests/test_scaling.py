"""CI smoke for the scaling-efficiency harness (benchmarks/scaling.py).

The sharded building blocks it times (``sharded_riccati_backward``,
``podscale_riccati_backward``) are equality-tested in test_parallel.py; this
guards the HARNESS itself — CLI, mesh construction, the efficiency-table
metric emission — so the north-star scaling artifact (VERDICT r1 item 1)
cannot bit-rot. Runs the --quick shapes on a 2-device virtual CPU mesh in a
subprocess (~2 min on the 1-core host; the harness must control XLA_FLAGS
before jax imports, so it cannot run in-process).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "scaling.py")


def test_scaling_quick_smoke(tmp_path):
    out_json = tmp_path / "scaling.json"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--backend", "cpu", "--devices", "2",
         "--quick", "--json", str(out_json)],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    result = json.loads(out_json.read_text())
    assert result["metric_mode"] in ("timeshared", "parallel")
    for section in ("traj_scaling", "horizon_scaling", "podscale_scaling"):
        table = result[section]
        # The sweep covers D=1 and D=2; every row reports timing + the
        # block-nnz/s rate the BASELINE target is phrased in.
        # The efficiency key depends on the host: "projected_efficiency" in
        # timeshared mode (1-core host), "efficiency" when cores >= devices.
        eff_key = (
            "projected_efficiency"
            if result["metric_mode"] == "timeshared"
            else "efficiency"
        )
        for d in ("1", "2"):
            row = table[d]
            assert row["seconds"] > 0.0
            assert row["block_nnz_per_sec"] > 0.0
            assert row[eff_key] > 0.0
        assert table["1"][eff_key] == 1.0
        assert table["best_1dev_seconds"] > 0.0
