#!/bin/bash
# Round-4 TPU validation queue A (one JAX process at a time on the
# tunneled TPU).  Regenerates the flagship artifacts (/tmp is wiped
# between rounds — round 3's PLC numbers died of exactly this), then
# immediately runs everything that consumes them.  Each stage logs to
# /tmp/r4_<stage>.log; the queue continues past individual failures.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* === $(date +%H:%M:%S)"
  timeout 10000 python "$@" > "/tmp/r4_${name}.log" 2>&1
  echo "=== $name exit $? === $(date +%H:%M:%S)"
}

run flagship scripts/validate_flagship.py 400 400 speech 2 0.5
run plc      scripts/validate_plc.py
run rate     scripts/validate_rate_control.py threshold
run stream   scripts/bench_streaming.py
echo "ROUND-4 QUEUE A DONE"
