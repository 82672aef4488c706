#!/usr/bin/env bash
# One-command end-to-end harness run (mirrors submission/runTestharness.sh).
# Usage: ./run_harness.sh [workload_dir]    (default: reference small workload)
set -euo pipefail
cd "$(dirname "$0")"
WL="${1:-/root/reference/submission/workloads/small}"
NAME="$(basename "$WL")"
exec python tools/harness.py "$WL/$NAME.init" "$WL/$NAME.work" "$WL/$NAME.result"
