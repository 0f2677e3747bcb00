"""Run bench.py only once the host's cold-fault bandwidth recovers.

The sandbox's first-touch page bandwidth swings 10 MB/s..4 GB/s between
minutes (see BENCH/BASELINE.md).  Cross-round comparisons are only
meaningful at matched host health, so this wrapper probes until
cold_fault_mbps >= the threshold (default 500, ~the round-3 reference
run's 966) or the wait budget expires, then execs bench.py.

Usage: python tools/bench_when_healthy.py [threshold_mbps] [max_wait_s]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import host_memory_health  # noqa: E402


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 500.0
    max_wait = float(sys.argv[2]) if len(sys.argv) > 2 else 600.0
    t0 = time.time()
    while True:
        h = host_memory_health()
        print(f"probe: {h}", file=sys.stderr, flush=True)
        if h["cold_fault_mbps"] >= threshold:
            break
        if time.time() - t0 > max_wait:
            print(
                f"WARN: no healthy window within {max_wait}s; running anyway",
                file=sys.stderr,
                flush=True,
            )
            break
        time.sleep(20)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.exit(subprocess.call([sys.executable, os.path.join(root, "bench.py")]))


if __name__ == "__main__":
    main()
