#!/bin/bash
# One-shot TPU evidence run (VERDICT r3 items 1 + 6): regenerate every
# measured perf artifact the docs cite, sequentially (one process may
# own the chip at a time).  Run from /root/repo the moment the axon
# tunnel answers:
#
#   bash scripts/run_tpu_evidence.sh
#
# Produces:
#   BENCH_headline.json        - bench.py single line (driver-format)
#   BENCH_EXTRA_r4.json        - one JSON object per line, every
#                                bench_extra row (retrieval p50 bf16 +
#                                int8, 4M-row int8 capacity, flash
#                                sweep, text tower, u8 ingest, host
#                                decode scaling + e2e feed, train steps
#                                timesformer/slowfast/yolo det+seg)
#   BENCH_PROFILE_r4.json      - conv-residual attribution rows
# then sync README.md + docs/PERF.md to the measured values by hand.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== sanity: single python owns the chip" >&2
ps aux | grep "[p]ython" | grep -v "$$" >&2 || true

run() {
  local name="$1" out="$2"; shift 2
  echo "== $name -> $out" >&2
  # NO timeout by default: bench_extra compiles 20+ program shapes and
  # CLAUDE.md documents 20s-9min per first compile through the relay —
  # a cold run can legitimately exceed 90 min, and a truncated evidence
  # artifact is worse than a slow one.  Set EVIDENCE_TIMEOUT=<secs> to
  # bound a step anyway.
  local -a cmd=("$@")
  if [[ -n "${EVIDENCE_TIMEOUT:-}" ]]; then
    cmd=(timeout "$EVIDENCE_TIMEOUT" "${cmd[@]}")
  fi
  if ! "${cmd[@]}" | tee "$out"; then
    echo "== $name FAILED (rc=$?); stopping — $out is incomplete, do" \
         "not commit it" >&2
    exit 1
  fi
  echo "== $name ok" >&2
}

run bench      BENCH_headline.json    python bench.py
run bench_extra BENCH_EXTRA_r4.json   python bench_extra.py
run profile    BENCH_PROFILE_r4.json  python bench_profile.py
echo "done; diff docs/PERF.md + README.md rows against the new values" >&2
