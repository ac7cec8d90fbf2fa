#!/bin/bash
# Sample Python-worker / daemon / JVM memory + fd counts while a soak runs.
# Catches worker RSS creep or fd exhaustion that would explain a silent
# "Python worker exited unexpectedly" (see BENCH/SOAK.md hung-worker notes).
# Usage: scripts/watch_workers.sh <out.log> [interval_sec]
OUT="${1:-/tmp/watch_workers.log}"
INT="${2:-20}"
echo "ts n_daemons max_worker_rss_mb sum_worker_rss_mb jvm_rss_mb jvm_fds mem_avail_mb" > "$OUT"
while true; do
  TS=$(date +%H:%M:%S)
  JVM_PID=$(pgrep -f 'java.*spark' | head -1)
  JVM_RSS=0; JVM_FDS=0
  if [ -n "$JVM_PID" ]; then
    JVM_RSS=$(awk '/VmRSS/{print int($2/1024)}' /proc/$JVM_PID/status 2>/dev/null)
    JVM_FDS=$(ls /proc/$JVM_PID/fd 2>/dev/null | wc -l)
  fi
  LINE=$(ps -eo rss,args | grep -E 'pyspark\.daemon|pyspark\.worker' | grep -v grep \
    | awk '{n++; s+=$1; if($1>m) m=$1} END {printf "%d %d %d", n, m/1024, s/1024}')
  AVAIL=$(awk '/MemAvailable/{print int($2/1024)}' /proc/meminfo)
  echo "$TS $LINE ${JVM_RSS:-0} $JVM_FDS $AVAIL" >> "$OUT"
  sleep "$INT"
done
