#!/usr/bin/env python
"""Round-over-round bench comparison with a host-noise flag
(VERDICT r5 item 6, second half).

Usage: python tools/bench_compare.py BENCH_rA.json BENCH_rB.json

Reads two driver bench records (either the raw one-line bench.py JSON
or the driver's wrapper with a "parsed" field), keys the comparison off
per-query MIN, and uses the fixed-plan calibration probe
(scan_filter_project, whose plan has been frozen since r1) to separate
host drift from plan regressions:

- calib_ratio = calib_B / calib_A measures the HOST between the runs;
- a query's normalized delta = (q_B / q_A) / calib_ratio;
- |normalized − 1| ≤ NOISE_BAND → "noise", else "faster"/"SLOWER".

Older records without a calibration field fall back to ratio 1 and are
marked uncalibrated.
"""

from __future__ import annotations

import json
import sys

NOISE_BAND = 0.20  # ±20%: the observed same-code swing band on this host


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    return doc.get("parsed", doc)


def calib_min(rec: dict):
    """Tightest calibration bound the record carries: r10 records run
    best-of-5 pre AND post battery (the top-level min already holds
    min(pre, post)); pre-r10 records carry a single post-battery
    best-of-3 min."""
    cal = rec.get("calibration") or {}
    cells = [cal.get("min")]
    for sub in ("pre", "post"):
        cells.append((cal.get(sub) or {}).get("min"))
    cells = [c for c in cells if c]
    return min(cells) if cells else None


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    calib_a = calib_min(a)
    calib_b = calib_min(b)
    if calib_a and calib_b:
        calib_ratio = calib_b / calib_a
        print(f"calibration (host drift): {calib_a:.3f}s -> {calib_b:.3f}s "
              f"(x{calib_ratio:.2f})")
    else:
        calib_ratio = 1.0
        print("calibration: absent in at least one record — UNCALIBRATED "
              "(raw ratios below)")

    qa, qb = a.get("queries", {}), b.get("queries", {})
    rows = []
    for name in sorted(set(qa) | set(qb)):
        if name not in qa or name not in qb:
            rows.append((name, None, None, "added" if name not in qa else "removed"))
            continue
        raw = qb[name] / qa[name] if qa[name] else float("inf")
        norm = raw / calib_ratio
        if abs(norm - 1.0) <= NOISE_BAND:
            verdict = "noise"
        elif norm < 1.0:
            verdict = "faster"
        else:
            verdict = "SLOWER"
        rows.append((name, raw, norm, verdict))

    width = max(len(r[0]) for r in rows)
    for name, raw, norm, verdict in rows:
        if raw is None:
            print(f"{name:<{width}}  {verdict}")
        else:
            print(f"{name:<{width}}  raw x{raw:5.2f}  normalized x{norm:5.2f}  {verdict}")

    flagged = [r[0] for r in rows if r[3] == "SLOWER"]
    ta, tb = a.get("value"), b.get("value")
    if ta and tb:
        print(f"\ntotal: {ta:.3f}s -> {tb:.3f}s (raw x{tb/ta:.2f}, "
              f"normalized x{(tb/ta)/calib_ratio:.2f})")
    print("regressions beyond the calibrated noise band:",
          ", ".join(flagged) if flagged else "none")


if __name__ == "__main__":
    main()
