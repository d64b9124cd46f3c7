#!/bin/bash
# Wait for a hypervisor-calm window, then exec the given command.
#
#   scripts/calm_window.sh <max_steal_secs> <sample_secs> <cmd...>
#
# This box's host steals CPU in storms (see BENCH.md "steal-aware
# trials"); wall-clock measurements taken inside a storm are meaningless.
# The loop samples machine-wide steal from /proc/stat and only launches
# the command after a sample window stays below the threshold.
set -u
if [ $# -lt 3 ]; then
  echo "usage: calm_window.sh <max_steal_secs> <sample_secs> <cmd...>" >&2
  exit 2
fi
case "$1$2" in *[!0-9]*)
  echo "calm_window: first two args must be integers (got '$1' '$2')" >&2
  exit 2 ;;
esac
max_steal_s=$1
window_s=$2
shift 2
while :; do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep "$window_s"
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$(( (s1 - s0) / 100 ))
  if [ "$d" -le "$max_steal_s" ]; then
    echo "calm_window: steal ${d}s in ${window_s}s - launching" >&2
    break
  fi
  echo "calm_window: steal ${d}s in ${window_s}s - waiting" >&2
done
exec "$@"
