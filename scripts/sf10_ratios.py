#!/usr/bin/env python3
"""Join the full-suite sf10 bench record against the sf1 and sf0.1 records
and print per-query scale ratios, flagging anything super-linear.

Usage: python3 scripts/sf10_ratios.py <sf10.json> [sf1.json] [sf01.json]

A query is linear-or-better when sf10/sf1 <= ~10 (10x the data). We flag
ratio > 20 (2x headroom over linear for shuffle/sort constants) as
"SUPER-LINEAR" and 12..20 as "watch". Queries present only at sf0.1 are
ratioed against that record (expected ratio <= 100 for linear scaling).
Emits a markdown table ready for BASELINE.md.
"""
import json, re, sys


def load(path):
    txt = open(path).read()
    # bench logs may carry an sbt "[info] " prefix; find the JSON object
    m = re.search(r'\{"metric".*\}', txt)
    return json.loads(m.group(0) if m else txt)


def main():
    sf10 = load(sys.argv[1])
    sf1 = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1.json")
    sf01 = load(sys.argv[3] if len(sys.argv) > 3 else "BENCH_r11_local.json")
    q10, q1, q01 = sf10["queries"], sf1["queries"], sf01["queries"]
    rows = []
    for name, t10 in sorted(q10.items()):
        if t10 < 0:
            rows.append((name, t10, None, None, "FAILED: " +
                         sf10.get("errors", {}).get(name, "?")[:60]))
            continue
        if name in q1 and q1[name] > 0:
            r = t10 / q1[name]
            flag = ("SUPER-LINEAR" if r > 20 else
                    "watch" if r > 12 else "")
            rows.append((name, t10, q1[name], r, flag))
        elif name in q01 and q01[name] > 0:
            r = t10 / q01[name]
            flag = ("SUPER-LINEAR(vs sf0.1)" if r > 200 else
                    "watch(vs sf0.1)" if r > 120 else "")
            rows.append((name, t10, None, r, flag))
        else:
            rows.append((name, t10, None, None, "no-baseline"))
    print("| query | sf10 s | sf1 s | ratio | note |")
    print("|---|---|---|---|---|")
    for name, t10, t1, r, flag in rows:
        if t10 < 0:
            print(f"| {name} | — | — | — | {flag} |")
        else:
            t1s = f"{t1:.2f}" if t1 is not None else "(sf0.1)"
            rs = f"{r:.1f}×" if r is not None else "—"
            print(f"| {name} | {t10:.2f} | {t1s} | {rs} | {flag} |")
    flagged = [x for x in rows if x[4] and not x[4].startswith("no-")]
    tot = sum(t for _, t, _, _, _ in rows if t > 0)
    print(f"\ntotal {tot:.0f} s / {len(rows)} queries; "
          f"{len(flagged)} flagged:")
    for name, t10, t1, r, flag in flagged:
        print(f"  {name}: {flag}" +
              (f" ratio={r:.1f}" if r else ""))


if __name__ == "__main__":
    main()
