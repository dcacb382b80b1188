#!/usr/bin/env python3
"""Per-query regression diff between two Bench JSON lines.

Usage: python3 scripts/bench_diff.py BENCH_r01.json BENCH_r02.json [threshold]

Exits non-zero if any query common to both runs slowed by more than
`threshold` (default 1.5x), mirroring BENCH_NOTES.md's rule. Queries
present in only one run are listed but never fail the diff (the headline
set is allowed to widen).
"""
import json
import sys


def load(path):
    """Accept either a raw Bench JSON line or the driver's BENCH_r{N}.json
    wrapper (bench line embedded in `parsed` or a log-tail string)."""
    import re
    text = open(path).read()
    try:
        d = json.loads(text)
        if isinstance(d, dict):
            if "queries" in d:
                return d
            if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
                return d["parsed"]
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric".*?"queries":\{[^}]*\}[^}]*\}', text.replace("\\\"", '"'))
    if m:
        return json.loads(m.group(0))
    raise SystemExit(f"no bench JSON line found in {path}")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    base, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    bq, nq = base["queries"], new["queries"]
    common = sorted(set(bq) & set(nq))
    regressions = []
    print(f"{'query':32s} {'base':>8s} {'new':>8s} {'ratio':>6s}")
    for q in common:
        ratio = nq[q] / bq[q] if bq[q] > 0 else float("inf")
        flag = " <-- REGRESSION" if ratio > threshold else ""
        print(f"{q:32s} {bq[q]:8.3f} {nq[q]:8.3f} {ratio:6.2f}{flag}")
        if ratio > threshold:
            regressions.append(q)
    for q in sorted(set(nq) - set(bq)):
        print(f"{q:32s} {'-':>8s} {nq[q]:8.3f}   new")
    for q in sorted(set(bq) - set(nq)):
        print(f"{q:32s} {bq[q]:8.3f} {'-':>8s}   removed")
    b_common = sum(bq[q] for q in common)
    n_common = sum(nq[q] for q in common)
    print(f"\ncommon-set total: {b_common:.2f}s -> {n_common:.2f}s "
          f"({n_common / b_common:.2f}x); grand total {new['value']:.2f}s")
    if regressions:
        print(f"FAIL: {len(regressions)} quer{'y' if len(regressions)==1 else 'ies'} "
              f"slower than {threshold}x: {', '.join(regressions)}")
        sys.exit(1)
    print(f"OK: no query slower than {threshold}x baseline")


if __name__ == "__main__":
    main()
