#!/bin/sh
# Push-button real-weight parity (VERDICT r2 #1): one command that, with
# network access, downloads the reference's exported torch artifacts (and, as
# a fallback for CLAP/Encodec, real upstream checkpoints from the HF hub),
# converts them to .npz weight bundles, runs all 4 parity checks x 7 model
# variants against the reference package, and writes PARITY_RESULTS.json.
# Without network it still runs, reporting exactly which checks are blocked.
#
# Usage: scripts/run_full_parity.sh [CKPT_DIR]
set -e
cd "$(dirname "$0")/.."
CKPT_DIR="${1:-${FAD_TPU_CKPT_DIR:-$HOME/.cache/fad_tpu}}"
echo "[run_full_parity] ckpt dir: $CKPT_DIR"
exec python scripts/verify_parity.py --all --fetch \
    --ckpt-dir "$CKPT_DIR" --json PARITY_RESULTS.json
