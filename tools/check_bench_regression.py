#!/usr/bin/env python
"""Per-query bench regression tripwire.

Compares the LATEST bench run (BENCH_DETAIL.json, written by bench.py)
against the committed per-query reference (BENCH_REFERENCE.json, a
trusted healthy-window sf0.1 run) and reports every query slower than
THRESHOLD× its reference — the same 2× band the driver applies to the
suite total, applied per query so a single operator regressing inside a
stable total cannot hide.

Retry-aware: a query's effective time is the MIN of its final timing and
its warm-pass timing (when the iterative block re-ran it), mirroring
bench.py's own host-variance policy. Queries new since the reference are
listed informationally, never failed on.

Usage: python tools/check_bench_regression.py [threshold]
Exit 1 iff any regression at the threshold (default 2.0).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    ref = json.load(open(os.path.join(ROOT, "BENCH_REFERENCE.json")))
    det = json.load(open(os.path.join(ROOT, "BENCH_DETAIL.json")))
    if det.get("sf") != ref.get("sf"):
        print(
            f"sf mismatch: detail ran at sf={det.get('sf')}, reference is "
            f"sf={ref.get('sf')} — per-query comparison is meaningless; skipping"
        )
        return 0
    warm = det.get("iterative", {}).get("warm", {}) or {}
    cur = {
        name: min(t, warm.get(name, t))
        for name, t in det.get("queries", {}).items()
    }

    # Absolute floor alongside the ratio: sub-second queries jitter
    # 2-3x between host windows without any code change (first
    # deployment flagged 0.08s -> 0.19s), so a regression must ALSO
    # cost at least MIN_DELTA_S of real wall time.
    MIN_DELTA_S = 0.5
    regressions, new = [], []
    for name, t in sorted(cur.items()):
        base = ref["queries"].get(name)
        if base is None:
            new.append(name)
        elif base > 0 and t > threshold * base and (t - base) > MIN_DELTA_S:
            regressions.append((name, base, t, t / base))
    for name, base, t, ratio in regressions:
        print(f"REGRESSION {name}: {base:.2f}s -> {t:.2f}s ({ratio:.1f}x)")
    if new:
        print(f"new since reference (not compared): {', '.join(new)}")
    n_ok = len(cur) - len(regressions) - len(new)
    print(
        f"checked {len(cur)} queries vs reference: {n_ok} within "
        f"{threshold}x, {len(regressions)} regressed, {len(new)} new"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
