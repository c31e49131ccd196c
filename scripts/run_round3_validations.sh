#!/bin/bash
# Round-3 TPU validation queue: run AFTER validate_ab_wall_time.py
# finishes (one JAX process at a time on the tunneled TPU).
# Each stage logs to /tmp/r3_<stage>.log; the queue continues past
# individual failures so one bad stage does not starve the rest.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 10000 python "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $name exit $? ==="
}

run ab1200   scripts/validate_ab_wall_time.py 1200 192 bunch1,bunch2
run bunch4   scripts/validate_bunch4_recovery.py 400 96
run mask     scripts/validate_mask_flagship.py 300 400
run iaf      scripts/validate_iaf_distill.py 400 300
run hardflag scripts/validate_flagship.py 300 400 speech_hard
echo "ALL ROUND-3 VALIDATIONS DONE"
