"""Wait for a sustained healthy-paging window, then run the north-rule
scaling protocol; retry until it produces a run whose best-run probes were
healthy (the pass/fail number is only meaningful when the host is not
page-fault-degraded — see BENCH/BASELINE.md host-noise section).

Usage: python scripts/scaling_watchdog.py [--executors] [--max-attempts N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def probe(mb: int = 64) -> float:
    import numpy as np

    t0 = time.perf_counter()
    a = np.ones(mb << 20, dtype=np.uint8)
    dt = time.perf_counter() - t0
    del a
    return (mb / 1024.0) / dt


def sustained_healthy(n: int = 3, gap_s: float = 20.0, min_gbps: float = 1.5) -> bool:
    for i in range(n):
        g = probe()
        print(f"# probe {i}: {g:.3f} GB/s", flush=True)
        if g < min_gbps:
            return False
        if i < n - 1:
            time.sleep(gap_s)
    return True


def main() -> None:
    executors = "--executors" in sys.argv
    max_attempts = 4
    if "--max-attempts" in sys.argv:
        max_attempts = int(sys.argv[sys.argv.index("--max-attempts") + 1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = os.path.join(
        repo, "BENCH", "scaling_executors.json" if executors else "scaling.json"
    )
    for attempt in range(max_attempts):
        while not sustained_healthy():
            print("# host degraded; sleeping 180s", flush=True)
            time.sleep(180)
        print(f"# attempt {attempt}: host healthy, running protocol", flush=True)
        env = dict(os.environ, BENCH_REPEATS="2")
        cmd = [sys.executable, os.path.join(repo, "bench.py")]
        cmd += ["--scaling-executors"] if executors else ["--scaling", "--pairs", "2"]
        subprocess.run(cmd, check=False, env=env, cwd=repo)
        try:
            rep = json.load(open(out_json))
        except Exception:
            rep = {}
        probes = [
            *(rep.get("host_mem_gbps_n") or []),
            *(rep.get("host_mem_gbps_4n") or []),
        ]
        degraded = any(p is not None and p < 0.8 for p in probes)
        print(f"# result: eff={rep.get('scaling_efficiency_per_core') or rep.get('scaling_efficiency_per_executor')} "
              f"pass={rep.get('passes_0.8')} probes={probes} degraded={degraded}", flush=True)
        if rep.get("passes_0.8") and not degraded:
            print("# PASS on healthy host; done", flush=True)
            return
        if not degraded:
            # healthy host but failed the bar: that IS the measurement;
            # keep the record and stop retrying
            print("# healthy-host result recorded (no retry)", flush=True)
            return
        print("# run straddled a degraded window; retrying", flush=True)
    print("# attempts exhausted", flush=True)


if __name__ == "__main__":
    main()
