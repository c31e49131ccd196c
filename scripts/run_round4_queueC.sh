#!/bin/bash
# Round-4 TPU validation queue C (one JAX process at a time on the
# tunneled TPU).  Reproduces the round-4 additions measured after
# queues A/B: the RTT-amortised bench (medians/MFU/train throughput +
# int8 twins), the int8 quality gate, the 5-seed paired PLC study
# (damp sweep + equal-rate FEC), the device-resident serving rows,
# and the GRU_A-640 capacity study.  Requires the flagship artifacts
# from queue A (validate_flagship.py) — /tmp is wiped between rounds.
# Logs to /tmp/r4_<stage>.log; the queue continues past failures.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10000 python "$@" > "/tmp/r4_${name}.log" 2>&1
  echo "=== $name exit $? === $(date +%H:%M:%S)"
}

run bench    bench.py
run int8     scripts/validate_int8.py
run plc      scripts/validate_plc.py
run stream   scripts/bench_streaming.py
run capacity scripts/validate_capacity.py 400
echo "ROUND-4 QUEUE C DONE"
