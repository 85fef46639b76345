#!/bin/bash
# Idempotent Track-G sweep queue: each line of QUEUE runs once; completed
# lines are recorded in tools/lattice/queue_done.log and skipped on
# relaunch, so the runner can be killed and restarted freely.
cd "$(dirname "$0")/../.."
DONE=tools/lattice/queue_done.log
touch "$DONE"

run() {
  local key="$1"; shift
  if grep -qxF "$key" "$DONE"; then
    return
  fi
  echo "$(date -u +%T) RUN $key" >> tools/lattice/queue_run.log
  "$@"
  echo "$key" >> "$DONE"
}

# 1. NOPIN core families (the corner pin is unsupported by the res-27
#    golden — every earlier sweep imposed it)
for f in 0 1 2 3 4 30; do
  run "nopin-v2-func-f$f" env ANCHOR2_NOPIN=1 ANCHOR2_FRAME=$f \
      python3 tools/lattice/solve_anchor2.py sweep func 24 60
done
run "nopin-v3-func-f0" env ANCHOR2_NOPIN=1 \
    python3 tools/lattice/solve_anchor3.py sweep func 24 30
run "nopin-v3-func-f30" env ANCHOR2_NOPIN=1 ANCHOR2_FRAME=30 \
    python3 tools/lattice/solve_anchor3.py sweep func 24 30
# 2. pinned frame completion (cheap)
for f in 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24 25 26 27 28 29 30 31 32 33 34 35; do
  run "pin-v2-func-f$f" env ANCHOR2_FRAME=$f \
      python3 tools/lattice/solve_anchor2.py sweep func 24 60
done
# 3. v4 16-state (pinned then nopin)
run "pin-v4-z2z4" python3 tools/lattice/solve_anchor4.py sweep 24 15 z2z4
run "pin-v4-swapflip" python3 tools/lattice/solve_anchor4.py sweep 24 15 swapflip
run "pin-v4-reflrot" python3 tools/lattice/solve_anchor4.py sweep 24 15 reflrot
run "nopin-v4-z2z4" env ANCHOR2_NOPIN=1 \
    python3 tools/lattice/solve_anchor4.py sweep 24 15 z2z4
run "nopin-v4-swapflip" env ANCHOR2_NOPIN=1 \
    python3 tools/lattice/solve_anchor4.py sweep 24 15 swapflip
# 4. NOPIN v2-func over remaining frames
for f in 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 22 23 24 25 26 27 28 29 31 32 33 34 35; do
  run "nopin-v2-func-f$f" env ANCHOR2_NOPIN=1 ANCHOR2_FRAME=$f \
      python3 tools/lattice/solve_anchor2.py sweep func 24 60
done
# 5. pos variants
for f in 0 30; do
  run "pin-v2-pos-f$f" env ANCHOR2_FRAME=$f \
      python3 tools/lattice/solve_anchor2.py sweep pos 24 30
  run "nopin-v2-pos-f$f" env ANCHOR2_NOPIN=1 ANCHOR2_FRAME=$f \
      python3 tools/lattice/solve_anchor2.py sweep pos 24 30
done
echo "$(date -u +%T) QUEUE_COMPLETE" >> tools/lattice/queue_run.log
