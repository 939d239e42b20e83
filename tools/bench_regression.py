"""Per-query bench regression check against BENCH_PINNED.json.

The driver's perf gate is "within 2x of the recorded baseline at the
same SF"; this tool makes that self-auditing instead of
judge-reconstructed. NOT a hard pytest — single-box wall times wobble
+-25%, so the tool reports and exits nonzero only on >2x regressions.

Usage:
    python bench.py > /tmp/bench_now.json          # fresh run (same SF!)
    python tools/bench_regression.py /tmp/bench_now.json

Re-pin (after an intentional perf change, from a fresh run):
    python tools/bench_regression.py /tmp/bench_now.json --pin
"""

from __future__ import annotations

import json
import os
import sys

PIN = os.path.join(os.path.dirname(__file__), "..", "BENCH_PINNED.json")
THRESHOLD = 2.0
# guard against flagging noise on sub-floor queries: anything under the
# JVM/planning floor is immeasurable, not regressed
FLOOR_S = 0.6


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        return 2
    with open(args[0]) as f:
        now = json.load(f)
    if "--pin" in sys.argv:
        with open(PIN, "w") as f:
            json.dump(now, f, indent=1)
        print(f"pinned {len(now['queries'])} queries at sf={now.get('sf')}")
        return 0
    with open(PIN) as f:
        pin = json.load(f)
    if now.get("sf") != pin.get("sf"):
        print(f"SF mismatch: now={now.get('sf')} pin={pin.get('sf')} — not comparable")
        return 2

    pq, nq = pin["queries"], now["queries"]
    regressed, improved, new = [], [], []
    for name, t in sorted(nq.items()):
        if name not in pq:
            new.append(name)
            continue
        base = pq[name]
        if t > FLOOR_S and base > 0 and t / base > THRESHOLD:
            regressed.append((name, base, t, t / base))
        elif base > FLOOR_S and t > 0 and base / t > THRESHOLD:
            improved.append((name, base, t, base / t))
    gone = sorted(set(pq) - set(nq))

    print(f"pin: {len(pq)} queries total={pin['value']}s | now: {len(nq)} total={now['value']}s")
    if new:
        print(f"unpinned (new since pin): {new}")
    if gone:
        print(f"MISSING vs pin (registry names must be stable): {gone}")
    for name, base, t, r in sorted(improved, key=lambda x: -x[3]):
        print(f"improved {r:4.1f}x  {name}: {base:.2f}s -> {t:.2f}s")
    if not regressed:
        print(f"OK: no query regressed >{THRESHOLD}x (floor {FLOOR_S}s)")
        return 1 if gone else 0
    for name, base, t, r in sorted(regressed, key=lambda x: -x[3]):
        print(f"REGRESSED {r:4.1f}x  {name}: {base:.2f}s -> {t:.2f}s")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
