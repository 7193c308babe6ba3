#!/bin/bash
# Count FORKED graft worker JVMs — the overlap watcher's sensor (round 16,
# ADVICE r15). The old `pgrep -f 'graft\.(Verify|Bench)'` counter also
# matched the sbt LAUNCHER (its argv carries 'runMain graft.Bench'), so
# every healthy stage read >=2 and the threshold was meaningless. `jps -l`
# reports each JVM's actual main class: a forked worker shows as
# `<pid> graft.Bench` / `<pid> graft.Verify`; the launcher shows as
# xsbt.boot.Boot / sbt-launch.jar and never matches.
#
# Usage:
#   tools/count_graft_jvms.sh                  # count from live `jps -l`
#   tools/count_graft_jvms.sh --stdin          # count from jps-format stdin (testable)
#   ... --warn LOGFILE [EXPECTED]              # append an OVERLAP WARNING to
#                                              # LOGFILE when count > EXPECTED
#                                              # (default 1); always prints count
set -u

STDIN=0
WARNLOG=""
EXPECTED=1
while [ $# -gt 0 ]; do
  case "$1" in
    --stdin) STDIN=1; shift ;;
    --warn)  WARNLOG="$2"; shift 2
             if [ $# -gt 0 ] && [[ "$1" =~ ^[0-9]+$ ]]; then EXPECTED="$1"; shift; fi ;;
    *) echo "unknown arg '$1'" >&2; exit 2 ;;
  esac
done

if [ "$STDIN" = 1 ]; then INPUT=$(cat); else INPUT=$(jps -l 2>/dev/null); fi
N=$(printf '%s\n' "$INPUT" | grep -Ec '^[0-9]+ graft\.(Verify|Bench)$')
echo "$N"
if [ -n "$WARNLOG" ] && [ "$N" -gt "$EXPECTED" ]; then
  echo "OVERLAP WARNING $(date -u +%FT%TZ): $N graft Verify/Bench worker JVMs running (expected <=$EXPECTED) — stage timings may be contaminated" >> "$WARNLOG"
fi
