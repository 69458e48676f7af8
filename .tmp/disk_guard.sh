#!/bin/bash
# Kill the sf10_pair DuckDB oracle subprocess if free disk < 10G.
MAIN=$(pgrep -f "scripts/sf10_pair.py" | head -1)
while [ -n "$MAIN" ] && kill -0 "$MAIN" 2>/dev/null; do
  FREE=$(df --output=avail -BG /root | tail -1 | tr -dc 0-9)
  if [ "$FREE" -lt 10 ]; then
    # children of the main process = the mp oracle subprocess
    for c in $(pgrep -P "$MAIN"); do
      echo "$(date -u +%T) disk ${FREE}G: killing oracle pid $c" >> .tmp/disk_guard.log
      kill -TERM "$c" 2>/dev/null
    done
    sleep 5
    rm -f .tmp/duckdb_temp_storage* 2>/dev/null
  fi
  sleep 20
done
