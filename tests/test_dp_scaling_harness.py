"""Smoke-validate the DP weak-scaling harness (round-3 verdict item 9).

Real multi-chip numbers remain hardware-blocked (one physical chip);
this validates that `scripts/bench_dp_scaling.py` runs its sharded
synthesis sweep on the virtual CPU mesh and emits a well-formed
artifact, so the harness is known-good before a slice ever shows up.
Efficiency VALUES on virtual devices are not meaningful (N virtual
devices share the host's cores) and are not asserted.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dp_scaling_smoke(tmp_path):
    out = tmp_path / "dp.json"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    subprocess.run(
        [
            sys.executable, "scripts/bench_dp_scaling.py",
            "--per_chip_batch", "1", "--t1", "16", "--t2", "32",
            "--tiny", "--max_data", "2", "--json_out", str(out),
        ],
        cwd=REPO, env=env, check=True, timeout=570,
    )
    payload = json.loads(out.read_text())
    assert payload["virtual_mesh"] is True
    assert [r["data"] for r in payload["rows"]] == [1, 2]
    for r in payload["rows"]:
        assert r["audio_s_per_s"] > 0
        assert r["ms_per_batch"] > 0
        assert 0 < r["efficiency"]
