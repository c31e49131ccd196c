#!/bin/bash
# Round-4 TPU validation queue B (one JAX process at a time on the
# tunneled TPU).  Runs after queue A (flagship/plc/rate/stream):
# the mask flagship under the production noise+ramp recipe, the mask
# rate-control frontier on its artifacts, and the 384-utterance
# equal-wall-time bunched A/B — the round-3 verdict's remaining
# unexecuted measurements.  Logs to /tmp/r4_<stage>.log; the queue
# continues past individual failures.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10000 python "$@" > "/tmp/r4_${name}.log" 2>&1
  echo "=== $name exit $? === $(date +%H:%M:%S)"
}

run mask     scripts/validate_mask_flagship.py 300 400
run ratemask scripts/validate_rate_control.py mask
run ab384    scripts/validate_ab_wall_time.py 1200 384 bunch1,bunch2,bunch2_ramp
echo "ROUND-4 QUEUE B DONE"
