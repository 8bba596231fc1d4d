"""Host DRAM-bandwidth control for the scaling gate: measure aggregate
memcpy bandwidth with N pinned worker processes at the SAME two parallelism
levels as the pipeline's scaling pair (2 vs 8 cores by default).

Why this exists: the pipeline's 2-to-8-core efficiency on this shared VM is
bounded by how far aggregate memory bandwidth itself scales 2->8 (Arrow
batches, shuffle buffers, parquet decode are all memcpy-shaped).  Running
the probe IN THE SAME SESSION as the bench gives a same-day host control:
if the pipeline's efficiency tracks the memcpy ceiling, the residual gap to
1.0 is the host, not the code.  Embedded into bench.py's JSON artifact as
"host_control".

Usage: python tools/host_probe.py [n_low] [n_high] [seconds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import sys, time
import numpy as np
n_bytes = 1 << 26  # 64 MiB per buffer: far beyond LLC, pure DRAM traffic
a = np.random.default_rng(0).integers(0, 255, n_bytes, dtype=np.uint8)
t_end = time.perf_counter() + float(sys.argv[1])
copied = 0
while time.perf_counter() < t_end:
    b = a.copy()
    copied += n_bytes
    a, b = b, a
print(copied)
"""


def aggregate_bandwidth(n_procs: int, seconds: float = 3.0) -> float:
    """Sum of per-process copy throughput (GB/s), one pinned process per
    core — the cgroup-per-executor analogue the pipeline legs also use."""
    procs = []
    for i in range(n_procs):
        cmd = [sys.executable, "-c", WORKER, str(seconds)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", str(i)] + cmd
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    total = 0
    for p in procs:
        out, _ = p.communicate()
        total += int(out.strip())
    return round(total / seconds / 1e9, 2)


def probe(
    n_low: int = 2, n_high: int = 8, seconds: float = 3.0, reps: int = 3
) -> dict:
    """Median-of-``reps`` per level, levels interleaved: a single short
    probe ALIASES the host's load swings (observed: instantaneous 2v8
    'efficiency' from 0.02 to 15.4 within minutes on this VM because one
    3-second window ran during a co-tenant burst) — the median of
    interleaved samples tracks the average bandwidth the much longer
    pipeline legs actually experience."""
    lows, highs = [], []
    for _ in range(reps):
        lows.append(aggregate_bandwidth(n_low, seconds))
        highs.append(aggregate_bandwidth(n_high, seconds))
    bw_low = sorted(lows)[reps // 2]
    bw_high = sorted(highs)[reps // 2]
    eff = round((bw_high / bw_low) / (n_high / n_low), 3)
    return {
        "memcpy_gbps_low": bw_low,
        "memcpy_gbps_high": bw_high,
        "samples_low": lows,
        "samples_high": highs,
        "cores": [n_low, n_high],
        "memcpy_efficiency": eff,
        "note": (
            "median aggregate pinned-memcpy bandwidth at the same two "
            "parallelism levels as the pipeline pair — the host DRAM "
            "ceiling a memory-bound job cannot exceed"
        ),
    }


if __name__ == "__main__":
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    print(json.dumps(probe(n_low, n_high, seconds)))
