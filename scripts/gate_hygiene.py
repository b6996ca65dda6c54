#!/usr/bin/env python3
"""CI-style gate hygiene: did every registered query ship a verify export?

Round 9 registered two queries (`sql_lateral`, `text_zipf`) in the final
commits without regenerating target/verify_out, so they reached the
driver with no locally-proven output. This check makes that gap loud:

  python3 scripts/gate_hygiene.py [verifyOutDir]     # default target/verify_out

Failures (exit 1):
  - an oracle_sql.json key with no <out>/<name>/ parquet dir (registered
    but never exported);
  - a query dir whose newest parquet is OLDER than the last commit that
    touched src/main/scala (code moved, export didn't — stale evidence).
Warnings (exit 0): dirs with no oracle entry (rows-only checks by design).
"""
import json, os, subprocess, sys

def main(out_dir):
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    if not os.path.exists(oracle_path):
        print(f"FAIL  no {oracle_path} — run graft.Verify first")
        return 1
    oracle = set(json.load(open(oracle_path)))
    dirs = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    rc = 0
    for name in sorted(oracle - dirs):
        print(f"FAIL  {name}: oracle registered but no verify export")
        rc = 1
    for name in sorted(dirs - oracle):
        print(f"WARN  {name}: export without oracle (rows-only check)")
    # stale exports: newer code than evidence
    try:
        code_t = int(subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", "src/main/scala"],
            capture_output=True, text=True).stdout.strip() or "0")
    except Exception:
        code_t = 0
    stale = []
    for name in sorted(dirs & oracle):
        d = os.path.join(out_dir, name)
        newest = max((os.path.getmtime(os.path.join(d, f))
                      for f in os.listdir(d)), default=0)
        if newest < code_t:
            stale.append(name)
    if stale:
        rc = 1
        print(f"FAIL  {len(stale)} exports predate the last src commit "
              f"(re-run Verify): {', '.join(stale[:8])}"
              + (" …" if len(stale) > 8 else ""))
    if rc == 0:
        print(f"OK    {len(oracle)} oracles, {len(dirs)} exports, none stale")
    return rc

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "target/verify_out"))
