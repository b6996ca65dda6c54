#!/bin/sh
# Prepare the box for the DuckDB oracle gate.
#
# Why: running a few hundred DuckDB oracle queries in one long-lived
# process accumulates ~54k memory maps (allocator behavior, not real
# memory pressure — RSS stays low). The kernel default
# vm.max_map_count=65530 is close enough that heavy queries
# intermittently die with duckdb.OutOfMemoryException ("Failed to
# allocate block of N bytes") while >100 GB RAM is free, and the
# failing queries MOVE between runs. Round 9 lost 168/290 gate rows to
# exactly this (see BASELINE.md "Oracle-harness reliability note" and
# VERDICT.md round 9 "What's wrong" #2).
#
# Remedy (the judge's, re-verified): raise the map cap before the gate.
# Run this before any CORRECTNESS gate, or fork the checker per ~40
# query batch like scripts/check.py does (either alone suffices; both
# together are safest).
set -e
cur=$(cat /proc/sys/vm/max_map_count)
if [ "$cur" -lt 1048576 ]; then
  sysctl -w vm.max_map_count=1048576
else
  echo "vm.max_map_count already $cur — ok"
fi
