#!/bin/bash
# Run the full e2e stage-bisect suite sequentially (one process per toggle:
# BCD_FUSED_SKIP is read at import). Writes one line per toggle to stdout.
# Usage: scripts/bisect_all.sh [H W TILE]
set -u
H=${1:-544}; W=${2:-960}; TILE=${3:-48}
cd "$(dirname "$0")/.."
for skip in "" gbuild chi2 box masks m2 k2solve k2jac k2chol k2xty k2bd k4acc k4fil; do
  BISECT_H=$H BISECT_W=$W BISECT_TILE=$TILE BCD_FUSED_SKIP=$skip \
    timeout 1500 python scripts/bisect_e2e.py 2>/dev/null | tail -1
done
