#!/bin/bash
# Snapshot gate (round 13, verdict ask #3): refuse to git-commit a tree
# whose Scala sources do not compile. Round 12's end-of-round snapshot
# committed a mid-edit tree (`bandedStore` unresolved), which burned the
# round's CORRECTNESS and BENCH artifacts — this hook makes that class
# of commit impossible.
#
# Installed as .git/hooks/pre-commit (tools/install_hooks.sh). The gate
# fails OPEN on anything that is not an actual compile error — sbt lock
# contention, a missing sbt, a timeout — because an environmental
# hiccup must never leave a round's work uncommitted. Override for a
# genuinely non-code commit with GRAFT_SKIP_COMPILE_GATE=1.
set -u
cd "$(git rev-parse --show-toplevel)" || exit 0
[ -n "${GRAFT_SKIP_COMPILE_GATE:-}" ] && exit 0

# Only gate commits that touch Scala sources or the build definition.
if ! git diff --cached --name-only | grep -qE '\.(scala|sbt)$|^project/'; then
  exit 0
fi

out=$(timeout 600 sbt -batch Test/compile 2>&1)
rc=$?
[ $rc -eq 0 ] && exit 0

if echo "$out" | grep -qE '\[error\].*(\.scala|Compilation failed|errors? found)'; then
  echo "$out" | grep '\[error\]' | head -20
  echo "snapshot gate: sbt Test/compile FAILED — refusing to commit."
  echo "  (override for a non-code commit: GRAFT_SKIP_COMPILE_GATE=1 git commit ...)"
  exit 1
fi

echo "snapshot gate: sbt exited rc=$rc without a recognizable compile error (lock? timeout?) — failing open"
exit 0
