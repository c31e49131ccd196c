#!/bin/bash
# Round-3 TPU validation queue (one JAX process at a time on the
# tunneled TPU).  Each stage logs to /tmp/r3_<stage>.log; the queue
# continues past individual failures so one bad stage does not starve
# the rest.  Stages added late in round 3 (ramp schedule, bunch4
# sparsity gate, flagship/mask flagship under the ramp recipe) are
# included; historical results for every stage live in VALIDATION.md.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 10000 python "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $name exit $? ==="
}

run ab1200   scripts/validate_ab_wall_time.py 1200 192 bunch1,bunch2
run ramp     scripts/validate_ab_wall_time.py 1200 96 bunch2,bunch2_noise,bunch2_ramp
run ab384    scripts/validate_ab_wall_time.py 1200 384 bunch1,bunch2,bunch2_ramp
run bunch4   scripts/validate_bunch4_recovery.py 400 96
run b4sparse scripts/validate_bunch4_recovery.py 400 96 b4gb64_noise,b4gb64_noise_sparse
run flagramp scripts/validate_flagship.py 400 400 speech 2 0.5
run mask     scripts/validate_mask_flagship.py 300 400        # noise=2 ramp 0.5 default
run iaf      scripts/validate_iaf_distill.py 400 300
run plc      scripts/validate_plc.py        # needs flagship artifacts
run hardflag scripts/validate_flagship.py 300 400 speech_hard
echo "ALL ROUND-3 VALIDATIONS DONE"
