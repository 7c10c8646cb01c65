#!/bin/bash
# Sourceable core of the chip work queue (scripts/r4_chip_queue.sh).
#
# Everything is env-overridable so the logic is testable under pytest with
# stub commands (tests/test_chip_queue_logic.py):
#   QUEUE_LOG_DIR    per-row logs + done-markers (default /tmp/r4_chip)
#   QUEUE_FIRED_FLAG probe-loop guard file (default /tmp/queue_fired)
#   QUEUE_CHIP_LOCK  host-wide TPU lock file (default /tmp/favae_chip.lock)
#   QUEUE_PROBE_CMD  relay probe command (default: killable subprocess probe)
#   QUEUE_REPO       repo the preserve step commits into (default /root/repo)
#   QUEUE_LOCK_WAIT  max seconds to wait for the chip lock (default 10800)
#   QUEUE_DATA_SUBDIR repo-relative preserve destination (default
#                     docs/data/r4_chip; the r5 queue sets docs/data/r5_chip)
#
# Semantics:
#   run NAME CMD...  — skip if done-marker exists; probe the relay first
#                      (re-arm + exit if down); run CMD under flock; write a
#                      done-marker unless the row looks relay-killed (rc=124
#                      or an explicit "backend unavailable" line) AND the
#                      relay is down afterwards.
#   preserve         — summarize + copy logs into $QUEUE_REPO/docs/data/r4_chip
#                      and commit (safe to call repeatedly / from EXIT trap).

L=${QUEUE_LOG_DIR:-/tmp/r4_chip}
QUEUE_FIRED_FLAG=${QUEUE_FIRED_FLAG:-/tmp/queue_fired}
QUEUE_CHIP_LOCK=${QUEUE_CHIP_LOCK:-/tmp/favae_chip.lock}
QUEUE_PROBE_CMD=${QUEUE_PROBE_CMD:-timeout 300 python scripts/tpu_probe.py}
QUEUE_REPO=${QUEUE_REPO:-/root/repo}
QUEUE_LOCK_WAIT=${QUEUE_LOCK_WAIT:-10800}
QUEUE_DATA_SUBDIR=${QUEUE_DATA_SUBDIR:-docs/data/r4_chip}
mkdir -p "$L/done"

probe_relay() {
  $QUEUE_PROBE_CMD >> "$L/probe.log" 2>&1
}

# Re-arm the probe loop (it skips probing while the fired-flag exists) and
# bail; done rows are skipped when the loop fires the queue again.
rearm_and_exit() {
  echo "=== relay lost — re-arming probe loop $(date +%H:%M:%S)" | tee -a "$L/queue.log"
  rm -f "$QUEUE_FIRED_FLAG"
  exit 1
}

run() {
  local name=$1; shift
  if [ -f "$L/done/$name" ]; then
    echo "=== $name skip (done) $(date +%H:%M:%S)" | tee -a "$L/queue.log"
    return 0
  fi
  probe_relay || rearm_and_exit
  echo "=== $name start $(date +%H:%M:%S)" | tee -a "$L/queue.log"
  # hold the host-wide chip lock per row so a driver-run bench.py (which
  # acquires the same lock in-process) never overlaps a queue row
  flock -w "$QUEUE_LOCK_WAIT" "$QUEUE_CHIP_LOCK" "$@" > "$L/$name.log" 2>&1
  local rc=$?
  echo "=== $name exit=$rc $(date +%H:%M:%S)" | tee -a "$L/queue.log"
  if [ $rc -eq 124 ] || grep -q "backend unavailable" "$L/$name.log"; then
    # timeout or explicit unavailable: relay-suspect. If the relay is down,
    # re-arm (row will retry on the next fire); if it is UP the row was
    # genuinely slow/broken — mark done so re-fires don't loop on it.
    probe_relay || rearm_and_exit
    echo "timeout-or-unavailable with relay up rc=$rc" > "$L/done/$name"
  else
    # completed (pass or deterministic failure — retrying the latter on a
    # re-fire would reproduce it and waste the relay window)
    echo "rc=$rc" > "$L/done/$name"
  fi
}

# Preserve whatever ran into the repo so results survive even if no builder
# session is alive when the queue finishes (or is cut off mid-run): copy the
# logs under docs/data/r4_chip/ and commit. Called after each phase and from
# an EXIT trap so a timeout/kill still lands a partial capture.
preserve() {
  ( cd "$QUEUE_REPO" && python scripts/summarize_chip_logs.py "$L" --write ) >/dev/null 2>&1 || true
  mkdir -p "$QUEUE_REPO/$QUEUE_DATA_SUBDIR"
  cp -f "$L"/*.log "$QUEUE_REPO/$QUEUE_DATA_SUBDIR/" 2>/dev/null
  cp -f "$L"/*.json "$L"/*.npz "$L"/*.png "$L"/SUMMARY.md "$QUEUE_REPO/$QUEUE_DATA_SUBDIR/" 2>/dev/null
  local tag
  tag=$(basename "$QUEUE_DATA_SUBDIR" | sed 's/_chip$//')
  ( cd "$QUEUE_REPO" && git add "$QUEUE_DATA_SUBDIR" >/dev/null 2>&1; \
    git commit --quiet -m "Capture $tag chip-queue logs" -- "$QUEUE_DATA_SUBDIR" ) || true
}
