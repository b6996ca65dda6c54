#!/bin/sh
# Red-build guard (VERDICT r13 "Next round" #10): round 13 lost ALL of
# its verified work because the end-of-round snapshot committed a tree
# that did not compile — the gate ran zero queries and the bench
# recorded only the compile failure. This preflight refuses a commit
# whose tree fails `sbt compile` + `Test/compile`.
#
# Installed as .git/hooks/pre-commit (see install block below). Bypass
# for emergencies: GRAFT_SKIP_PREFLIGHT=1 git commit ... (or -n).
#
# Install/refresh the hook:
#   sh scripts/preflight.sh --install
set -e
cd "$(dirname "$0")/.."

if [ "$1" = "--install" ]; then
  cat > .git/hooks/pre-commit <<'EOF'
#!/bin/sh
[ "$GRAFT_SKIP_PREFLIGHT" = "1" ] && exit 0
exec sh scripts/preflight.sh
EOF
  chmod +x .git/hooks/pre-commit
  echo "preflight: pre-commit hook installed"
  exit 0
fi

if [ "$GRAFT_SKIP_PREFLIGHT" = "1" ]; then
  echo "preflight: skipped via GRAFT_SKIP_PREFLIGHT=1"
  exit 0
fi

echo "preflight: sbt compile + Test/compile (red-build guard)..."
if ! sbt -batch compile Test/compile > /tmp/graft_preflight.log 2>&1; then
  echo "preflight: COMPILE FAILED — refusing to commit a red build." >&2
  echo "preflight: last 20 lines of /tmp/graft_preflight.log:" >&2
  tail -20 /tmp/graft_preflight.log >&2
  exit 1
fi
echo "preflight: green."
