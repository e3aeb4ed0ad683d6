#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (bench_out.json / BENCH_r*.json):
per-query deltas sorted by regression, plus totals. Usage:

    python3 tools/bench_diff.py OLD.json NEW.json [--threshold 2.0]

Exit code 1 when any query regresses by more than --threshold x (and by
more than 0.2 s absolute, so sub-noise toy queries can't fail the gate).
"""
import json
import sys


def load(path):
    with open(path) as f:
        # driver artifacts may carry trailing log lines; take the first
        # line that parses as a JSON object with a "queries" key
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in obj:
                return obj
    raise SystemExit(f"{path}: no bench JSON line with a 'queries' map")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a
                              else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf") if a is None else 0.0, name, a, b))
        elif a > 0:
            rows.append((b / a, name, a, b))
    rows.sort(reverse=True)
    regressions = 0
    print(f"{'query':34} {'old':>8} {'new':>8} {'ratio':>7}")
    for ratio, name, a, b in rows:
        if a is None:
            print(f"{name:34} {'ADDED':>8} {b:8.2f}")
            continue
        if b is None:
            print(f"{name:34} {a:8.2f} {'GONE':>8}")
            continue
        flag = ""
        if ratio > threshold and b - a > 0.2:
            flag = "  << REGRESSION"
            regressions += 1
        print(f"{name:34} {a:8.2f} {b:8.2f} {ratio:7.2f}{flag}")
    print(f"\ntotal: {old.get('value')} -> {new.get('value')} s "
          f"({len(oq)} -> {len(nq)} queries); "
          f"{regressions} regression(s) over {threshold}x")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
