#!/bin/bash
# Pre-commit / pre-snapshot guard: never commit a tree that doesn't
# compile (the round-12 loss: one broken file zeroed the round's entire
# correctness run). Run before ANY end-of-round or milestone commit:
#   tools/preflight.sh          # compile main + test sources
#   tools/preflight.sh --test   # additionally run the full suite
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch "compile; Test/compile" 2>&1 | tail -3
if [[ "${1:-}" == "--test" ]]; then
  sbt -batch test 2>&1 | tail -5
fi
echo "preflight OK"
