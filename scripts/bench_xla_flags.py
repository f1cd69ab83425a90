"""XLA/libtpu flag sweep over the headline train step (real chip).

ROADMAP round-2 leftovers: "XLA fusion-flag exploration ... expected <10%".
This runs bench.py in a subprocess per flag set (flags must be set before
backend init, hence subprocesses) and reports img/s/chip for each.

Note: under the axon tunnel, compilation happens in a remote compile service;
client-side XLA_FLAGS may or may not propagate. A flag set whose result
exactly matches baseline (same compiled program fingerprint) is reported as
such — that is itself the measurement.

Usage: python scripts/bench_xla_flags.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SWEEPS = {
    "baseline": "",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "no_rwb_fusion": "--xla_tpu_rwb_fusion=false",
    "aggressive_flags": (
        "--xla_tpu_scoped_vmem_limit_kib=98304 "
        "--xla_tpu_enable_latency_hiding_scheduler=true"
    ),
}


def main():
    results = {}
    for name, flags in SWEEPS.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                env=env,
                cwd=ROOT,
                capture_output=True,
                text=True,
                timeout=900,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if line:
                results[name] = json.loads(line[-1])["value"]
            else:
                results[name] = f"no-output rc={out.returncode}: {out.stderr.strip()[-200:]}"
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
