#!/usr/bin/env python
"""Run every perf artifact sequentially on the real chip (one process at a
time — concurrent TPU jobs starve each other on the tunneled dev device).

Order: e2e text -> e2e images -> IVF 1M clustered A/B -> bench sanity.
Each stage is its own subprocess with a timeout; a stage failure (or a
wedged tunnel killing one) doesn't stop the rest.  Artifacts land in
docs/perf/ and bench prints its JSON line to stdout.

Usage:
  python scripts/run_all_perf.py [--skip e2e_images,bench] [--dry-run]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

STAGES = [
    ("e2e_text", 900, [sys.executable, "scripts/profile_e2e.py",
                       "--n-docs", "16000",
                       "--output", "docs/perf/e2e_pipeline.json"]),
    ("e2e_images", 1200, [sys.executable, "scripts/profile_e2e.py",
                          "--n-docs", "8000", "--images",
                          "--image-size", "64", "--clip-image-size", "64",
                          "--skip-object",
                          "--output", "docs/perf/e2e_pipeline_images.json"]),
    ("ivf_1m", 1800, [sys.executable, "scripts/profile_ivf_1m.py"]),
    ("scan_breakdown", 900, [sys.executable,
                             "scripts/profile_scan_breakdown.py"]),
    ("ivf_recall_curve", 3600, [sys.executable,
                                "scripts/profile_ivf_recall_curve.py"]),
    ("serving", 900, [sys.executable, "scripts/profile_serving.py",
                      "--output", "docs/perf/serving.json"]),
    ("signals_sharded", 900, [sys.executable,
                              "scripts/profile_signals_sharded.py"]),
    ("tokenize_scaling", 600, [sys.executable,
                               "scripts/profile_tokenize_scaling.py"]),
    ("bench", 1200, [sys.executable, "bench.py"]),
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip", default="", help="comma list of stage names")
    ap.add_argument("--only", default="", help="comma list of stage names")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}

    # Single-core host: perf numbers are garbage if pytest (or any heavy CPU
    # job) runs concurrently.  Convention (manual, not enforced anywhere in
    # the library): whoever starts such a job does `touch
    # /tmp/dewi_cpu_busy.lock` and removes it after; we wait for it to
    # clear (bounded, in case a crashed job left it behind).
    lock = Path("/tmp/dewi_cpu_busy.lock")
    waited = 0.0
    while not args.dry_run and lock.exists() and waited < 2400:
        if waited == 0:
            print(f"== waiting on {lock} (CPU-heavy job in flight)", flush=True)
        time.sleep(30)
        waited += 30
    if not args.dry_run and lock.exists():
        print(f"== {lock} still present after {waited:.0f}s; proceeding anyway",
              flush=True)

    results = {}
    for name, timeout, cmd in STAGES:
        if name in skip or (only and name not in only):
            print(f"== {name}: skipped", flush=True)
            continue
        print(f"== {name}: {' '.join(cmd)} (timeout {timeout}s)", flush=True)
        if args.dry_run:
            continue
        t0 = time.time()
        try:
            rc = subprocess.run(cmd, cwd=ROOT, timeout=timeout).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        results[name] = (rc, round(time.time() - t0, 1))
        print(f"== {name}: rc={rc} ({results[name][1]}s)", flush=True)
    print("== summary:", results, flush=True)
    return 0 if all(rc == 0 for rc, _ in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
