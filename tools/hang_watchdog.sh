#!/bin/bash
# Kill TPU campaign legs that hit the axon RPC-hang failure mode (process
# alive, ~0% CPU, log silent for good — e.g. the fvcg channelized leg sat
# 35 min at "Start training"; tools/fvcg_compile_probe.py proved the
# executables compile in minutes, so silence >> compile time = hang).
#
# Mechanism: every 2 min, for each python process whose stdout (fd/1)
# points at a file under logs/, compare the log's mtime to now.  If the
# log has been silent longer than STALE_S and the process is older than
# STALE_S, kill that EXACT pid (never pattern-kill).  The campaign's
# `timeout` wrapper then moves to the next leg ~75 min sooner than the
# 90-min leg timeout would.
#
# STALE_S (18 min) clears every legitimate quiet window we have measured:
# fresh compiles are 20-200 s/executable (2-4 per driver), epoch prints
# are seconds apart, probe phases print between compiles.
#
# Launch:  nohup bash tools/hang_watchdog.sh >> logs/hang_watchdog.log 2>&1 &
STALE_S=1080
cd "$(dirname "$0")/.." || exit 1
echo "$(date) hang_watchdog up (stale threshold ${STALE_S}s)"
while true; do
  now=$(date +%s)
  for pid in $(ps -eo pid= -o comm= | awk '$2 == "python" {print $1}'); do
    log=$(readlink "/proc/$pid/fd/1" 2>/dev/null)
    case "$log" in
      */repo/logs/*.log) ;;
      *) continue ;;
    esac
    [ -f "$log" ] || continue
    mtime=$(stat -c %Y "$log" 2>/dev/null) || continue
    start=$(stat -c %Y "/proc/$pid" 2>/dev/null) || continue
    age=$((now - mtime)); procage=$((now - start))
    if [ "$age" -gt "$STALE_S" ] && [ "$procage" -gt "$STALE_S" ]; then
      echo "$(date) killing pid $pid: $log silent ${age}s (proc ${procage}s)"
      kill "$pid" 2>/dev/null
    fi
  done
  sleep 120
done
