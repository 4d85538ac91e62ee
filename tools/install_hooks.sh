#!/bin/bash
# Install the repo's git hooks (idempotent). Run once per checkout:
#   bash tools/install_hooks.sh
cd "$(git rev-parse --show-toplevel)" || exit 1
cp tools/snapshot_gate.sh .git/hooks/pre-commit
chmod +x .git/hooks/pre-commit tools/snapshot_gate.sh
echo "installed .git/hooks/pre-commit -> tools/snapshot_gate.sh"
