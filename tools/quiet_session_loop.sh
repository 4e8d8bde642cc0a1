#!/bin/bash
# Opportunistic scaling-pair collector for the host-shared box: every POLL
# seconds, if 1-min loadavg < THRESH and none of our own Spark/pytest work
# is running, launch ONE pinned N/4N pair (SPARK_GRAFT_SCALE_RUNS=1).
# Writes /tmp/scaling_session.lock while a session runs so interactive work
# can avoid contaminating it. Every pair is recorded in
# BENCH/sessions.jsonl regardless of outcome (selection happens at LAUNCH
# time — experimental control — never at reporting time).
set -u
MAX_SESSIONS=${1:-8}
THRESH=${2:-1.0}
POLL=${3:-120}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOCK=/tmp/scaling_session.lock
n=0
while [ "$n" -lt "$MAX_SESSIONS" ]; do
  sleep "$POLL"
  load=$(cut -d' ' -f1 /proc/loadavg)
  # any live JVM = some Spark work is running (incl. ad-hoc driver scripts
  # that no name pattern would catch) — do not launch into it
  busy=$(pgrep -fc 'pytest|spark-submit|parity_check|bench\.py|SparkSubmit|plan_audit' || true)
  jvms=$(pgrep -xc java || true)
  busy=$((busy + jvms))
  ok=$(awk -v l="$load" -v t="$THRESH" 'BEGIN{print (l<t)?1:0}')
  if [ "$ok" = "1" ] && [ "${busy:-0}" = "0" ] && [ ! -e "$LOCK" ]; then
    touch "$LOCK"
    echo "$(date +%H:%M:%S) load=$load -> launching pair $n" >> /tmp/quiet_loop.log
    SPARK_GRAFT_SCALE_RUNS=1 python "$REPO/tools/scaling_bench.py" \
      >> /tmp/quiet_loop.log 2>&1
    rm -f "$LOCK"
    n=$((n+1))
  fi
done
echo "$(date +%H:%M:%S) done: $n sessions" >> /tmp/quiet_loop.log
