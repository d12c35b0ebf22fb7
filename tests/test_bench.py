"""Smoke-test the measurement harness itself.

bench.py is load-bearing for every performance claim in this repo, but
nothing imported it from tests — so commit b94d251 could grow render_chunk
to a 5-tuple and leave the two --latency branches crashing on a 4-tuple
unpack for a whole round (VERDICT r4 weak item 2). This runs the
throughput + latency + latency-live code paths end-to-end at tiny CPU
shapes so a contract drift between the render loop and any measurement
branch fails in CI, not on the chip.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_small_throughput_and_latency_paths():
    env = dict(os.environ)
    # --small pins jax to CPU itself; keep the child away from the remote
    # TPU backend registration either way
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--small",
         "--latency", "--latency-live", "--chunk", "2"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-4000:]

    # ONE parseable JSON headline line on stdout (the driver contract)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, proc.stdout
    result = json.loads(lines[0])
    assert result["metric"].startswith("render_fps_")
    assert result["value"] > 0
    assert result["unit"] == "fps"
    assert abs(result["vs_baseline"] - result["value"] / 25.0) < 1e-3

    # both latency branches ran and reported
    assert "# latency-live (chunk=2" in proc.stderr, proc.stderr[-4000:]
    assert "# latency: sync chunk dispatch->host" in proc.stderr, \
        proc.stderr[-4000:]
