#!/usr/bin/env python
"""Round-over-round bench comparison with a host-noise flag
(VERDICT r5 item 6, second half; driver-wrapper parsing r11 —
VERDICT r10 item 7).

Usage: python tools/bench_compare.py BENCH_rA.json BENCH_rB.json

Reads two bench records in ANY of the three formats the rounds have
produced:

- the raw one-line bench.py JSON;
- the driver's wrapper with a non-null "parsed" field;
- the driver's wrapper with "parsed": null and a "tail" string holding
  only the LAST ~2k chars of stdout (BENCH_r10.json's shape): the JSON
  line is reconstructed from the tail — progress-bar noise is dropped
  by keeping the final stdout line, and a truncated prefix is repaired
  by re-wrapping from the first clean `", "` key boundary (the
  truncation can land mid-key or mid-number; queries cut off the front
  are reported as "not in stored tail", never as regressions).

Comparison keys off per-query MIN and uses the fixed-plan calibration
probe (scan_filter_project, frozen since r1) to separate host drift
from plan regressions:

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


def parse_wrapper_tail(tail: str) -> dict | None:
    """Reconstruct the bench JSON from a driver-wrapper "tail" string.

    The tail is the end of the bench process's stdout: possibly some
    progress-bar noise, then the one-line JSON (possibly with its HEAD
    truncated away). Strategy: take the last non-empty stdout line; if
    it parses whole, done. Otherwise chop to successive `", "` key
    boundaries and try re-wrapping as (a) a top-level suffix or (b) a
    suffix that starts inside the "queries" dict — the two places a
    fixed-size tail can land. First candidate that parses wins.
    """
    lines = [ln for ln in tail.rstrip().splitlines() if ln.strip()]
    if not lines:
        return None
    line = lines[-1]
    # progress bars glue \r-prefixed junk in front — keep from the
    # last '{"' if the line holds a complete object
    start = line.find('{"')
    if start >= 0:
        try:
            return json.loads(line[start:])
        except ValueError:
            pass
    # truncated head: retry from each clean key boundary (`, "` follows
    # every pair — values are numbers, so a quote-comma pattern would
    # skip the whole queries dict and land mid-calibration)
    pos = 0
    for _ in range(8):
        nxt = line.find(', "', pos)
        if nxt < 0:
            return None
        rem = line[nxt + 2 :]  # points at `"key": ...`
        for wrap, mark in (
            ("{" + rem, False),  # truncation at top level
            ('{"queries": {' + rem, True),  # truncation inside queries
        ):
            try:
                doc = json.loads(wrap)
            except ValueError:
                continue
            if mark:
                doc["_queries_truncated"] = True
            return doc
        pos = nxt + 1
    return None


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if doc.get("parsed"):
        return doc["parsed"]
    if isinstance(doc.get("tail"), str):
        rec = parse_wrapper_tail(doc["tail"])
        if rec is not None:
            return rec
        print(f"WARNING: {path}: wrapper tail unparseable — raw doc used")
    return doc


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
    for rec, path in ((a, sys.argv[1]), (b, sys.argv[2])):
        if rec.get("_queries_truncated"):
            print(
                f"note: {path} reconstructed from a truncated wrapper tail — "
                "its leading headline entries and total are NOT in the record"
            )
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

    qa = {**a.get("queries", {}), **a.get("extra_queries", {})}
    qb = {**b.get("queries", {}), **b.get("extra_queries", {})}
    rows = []
    for name in sorted(set(qa) | set(qb)):
        if name not in qa or name not in qb:
            missing_rec = a if name not in qa else b
            label = (
                "not in stored tail"
                if missing_rec.get("_queries_truncated")
                else ("added" if name not in qa else "removed")
            )
            rows.append((name, None, None, label))
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
    else:
        common = [n for n in qa if n in qb]
        if common:
            sa, sb = sum(qa[n] for n in common), sum(qb[n] for n in common)
            print(f"\ncomparable-subset total ({len(common)} queries): "
                  f"{sa:.3f}s -> {sb:.3f}s (raw x{sb/sa:.2f}, "
                  f"normalized x{(sb/sa)/calib_ratio:.2f})")
    print("regressions beyond the calibrated noise band:",
          ", ".join(flagged) if flagged else "none")


if __name__ == "__main__":
    main()
