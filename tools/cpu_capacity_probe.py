"""Host per-core-capacity probe (no Spark, no memory traffic).

Runs a fixed pure-CPU workload (sha256 chain) on 1 / 4 / 16 concurrent
processes and reports the wall time of the SAME per-process work at each
occupancy. On dedicated hardware the walls are equal; on this sandbox VM
the per-thread rate droops as occupancy rises (hypervisor capping or
frequency scaling), which bounds the best possible N→4N "scaling
efficiency" of ANY CPU-bound job — including the bench's control — below
1.0 from the hardware side. The scaling evidence in BENCH/BASELINE.md
cites this probe: divide a measured efficiency by the probe ratio at the
same levels to get the engine's share.

Usage: python tools/cpu_capacity_probe.py [iterations-per-process]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import sys
import time


def _spin(n: int) -> float:
    h = b"x" * 64
    t0 = time.monotonic()
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return time.monotonic() - t0


def occupancy_wall(threads: int, n: int) -> float:
    """Wall seconds for `threads` processes each doing `n` hash steps."""
    with mp.Pool(threads) as pool:
        t0 = time.monotonic()
        pool.map(_spin, [n] * threads)
        return time.monotonic() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    out: dict = {"loadavg": os.getloadavg(), "iters_per_proc": n, "walls": {}}
    for t in (1, 4, 16):
        out["walls"][t] = round(occupancy_wall(t, n), 3)
    w = out["walls"]
    out["capacity_ratio_1_to_4"] = round(w[1] / w[4], 3)
    out["capacity_ratio_4_to_16"] = round(w[4] / w[16], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
