"""STREAM-triad hardware probe: is the BOX scaling, independent of Spark?

Measures memory bandwidth (`c = a + 1.5*b` over 3x40M-double arrays, 5
sweeps) and a scalar CPU rate (sum(range) sweeps) at 1 and 4 concurrent
processes, interleaved over `REPS` rounds. Run it in the SAME window as a
scaling_bench result to attribute a poor N->4N efficiency: if the box's own
DRAM or CPU scaling (x4_aggregate / (4 * x1)) is below the engine's measured
efficiency — or the absolute single-process bandwidth is far below the
quiet-window ~6+ GB/s — the limiter is the environment, not the plan
(methodology established in round 3, BENCH/BASELINE.md 'final-binary
scaling re-check'; made a persistent script in round 4 after a window where
single-process triad measured 0.28 GB/s).

Usage: python scripts/hwprobe.py        # prints one JSON line
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

N = 40_000_000
SWEEPS = 5
SCALAR_SWEEPS = 20
REPS = 3


def _triad_gbps() -> float:
    import numpy as np

    a = np.ones(N)
    b = np.full(N, 2.0)
    c = np.zeros(N)
    t0 = time.monotonic()
    for _ in range(SWEEPS):
        np.add(a, 1.5 * b, out=c)
    wall = time.monotonic() - t0
    return (3 * 8 * N * SWEEPS) / wall / 1e9


def _scalar_mops() -> float:
    t0 = time.monotonic()
    for _ in range(SCALAR_SWEEPS):
        sum(range(10_000_000))
    wall = time.monotonic() - t0
    return SCALAR_SWEEPS * 10.0 / wall  # M additions / s


def _fan(kind: str, procs: int) -> float:
    """Aggregate rate (sum over workers) at `procs` concurrent workers."""
    ps = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", kind],
            stdout=subprocess.PIPE, text=True,
        )
        for _ in range(procs)
    ]
    return sum(float(p.communicate()[0].strip()) for p in ps)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        print(_triad_gbps() if sys.argv[2] == "triad" else _scalar_mops())
        return
    out: dict = {}
    for kind in ("triad", "scalar"):
        x1s, x4s = [], []
        for _ in range(REPS):  # interleaved so drift hits both widths alike
            x1s.append(_fan(kind, 1))
            x4s.append(_fan(kind, 4))
        med1, med4 = statistics.median(x1s), statistics.median(x4s)
        out[kind] = {
            "unit": "GB/s" if kind == "triad" else "M ops/s",
            "x1_reps": [round(v, 3) for v in x1s],
            "x4_aggregate_reps": [round(v, 3) for v in x4s],
            "scaling_median": round(med4 / (4 * med1), 3),
            "scaling_per_rep": [round(b / (4 * a), 3) for a, b in zip(x1s, x4s)],
        }
    out["host_load1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
