"""Smoke tests: every committed example runs end-to-end (tiny sizes, CPU).

Examples are user-facing documentation that executes; a silently broken
one is worse than none.  Each runs in a subprocess (they configure
platforms/devices at process scope) with sizes shrunk via
``DEWI_EXAMPLE_DOCS``.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(script: str, extra_env: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, str(REPO / "examples" / script)],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO,
    )


def test_columnar_pipeline_example():
    out = _run("columnar_pipeline.py", {"DEWI_EXAMPLE_DOCS": "96"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "resumed run:" in out.stdout
    assert "search 'solar particles in the atmosphere'" in out.stdout


def test_multichip_search_example():
    out = _run(
        "multichip_search.py",
        {
            "DEWI_EXAMPLE_DOCS": "512",
            "_DEWI_VIRTUAL_MESH": "1",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "exact tier: sharded top-10 == single-device top-10" in out.stdout
    assert "quantized tier" in out.stdout


def test_index_tiers_example():
    out = _run("index_tiers.py", {"DEWI_EXAMPLE_DOCS": "1024"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "all tiers hold the >=0.99 recall gate" in out.stdout
