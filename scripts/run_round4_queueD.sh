#!/bin/bash
# Round-4 TPU validation queue D (one JAX process at a time on the
# tunneled TPU).  Reproduces the LATE round-4 additions: the
# wide-batch sampler scaling study (per-row stores past the 128-lane
# tile; headline bunch4 @ b768), the refreshed bench with wide-batch
# rows competing for the headline, the wide-stream serving capacity
# table, and the rate-control frontier with NSIM columns (requires
# the flagship artifacts from validate_flagship.py — /tmp is wiped
# between rounds).  Logs to /tmp/r4_<stage>.log; the queue continues
# past failures.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10000 python "$@" > "/tmp/r4_${name}.log" 2>&1
  echo "=== $name exit $? === $(date +%H:%M:%S)"
}

run batchscale scripts/bench_batch_scaling.py bunch4,bunch4_sparse 128,256,512,768
run bench      bench.py
run streamwide scripts/bench_streaming.py 50 256,512
run ratensim   scripts/validate_rate_control.py threshold
echo "ROUND-4 QUEUE D DONE"
