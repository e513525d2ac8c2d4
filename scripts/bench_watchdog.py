"""Wait for a sustained healthy-paging window, then run the headline bench
(`python bench.py`), capturing the JSON line to BENCH/bench_headline_latest.json.

The headline replay number is only meaningful in a healthy window (see
BENCH/BASELINE.md host-noise section); this loops until one occurs.

Usage: python scripts/bench_watchdog.py [--max-attempts N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def probe(mb: int = 64) -> float:
    """Sustained page-touch rate: median of 5 back-to-back rounds (the
    single-shot variant only measured the one-time cold first-fault
    penalty — see bench._page_touch_gbps docstring for the r05-s2
    characterization data)."""
    import numpy as np

    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        a = np.ones(mb << 20, dtype=np.uint8)
        dt = time.perf_counter() - t0
        del a
        rates.append((mb / 1024.0) / dt)
    return sorted(rates)[len(rates) // 2]


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
    max_attempts = 3
    if "--max-attempts" in sys.argv:
        max_attempts = int(sys.argv[sys.argv.index("--max-attempts") + 1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_json = os.path.join(repo, "BENCH", "bench_headline_latest.json")
    for attempt in range(max_attempts):
        while not sustained_healthy():
            print("# host degraded; sleeping 180s", flush=True)
            time.sleep(180)
        print(f"# attempt {attempt}: healthy window, running bench.py", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True,
            text=True,
            cwd=repo,
        )
        line = None
        for ln in reversed(p.stdout.splitlines()):
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
                break
        if line is None:
            print(f"# bench produced no JSON (rc={p.returncode}); retrying", flush=True)
            print(p.stderr[-2000:], flush=True)
            continue
        rec = json.loads(line)
        end_g = probe()
        rec["watchdog_probe_end_gbps"] = round(end_g, 3)
        with open(out_json, "w") as f:
            json.dump(rec, f, indent=2)
        print(json.dumps(rec), flush=True)
        if not rec.get("host_degraded") and end_g >= 1.5:
            print("# healthy-window record captured; done", flush=True)
            return
        print("# window flapped mid-run; retrying", flush=True)
    print("# max attempts exhausted", flush=True)


if __name__ == "__main__":
    main()
