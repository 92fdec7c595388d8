#!/bin/bash
# Round-5 flagship session: rank-5 warm target <= 12 s, rank-6 <= 400 s.
# One TPU process at a time (CLAUDE.md).  Logs under /tmp/flagship_r5/.
set -u
mkdir -p /tmp/flagship_r5
cd /root/repo

echo "=== rank-5 dim-100 (f32, 2 passes) $(date) ==="
SYMTENSOR_BASIS_VERBOSE=1 timeout 5400 \
  python benchmarks/basis_change_flagship.py 5 100 \
  > /tmp/flagship_r5/r5.log 2> /tmp/flagship_r5/r5.verbose.log
echo "rank-5 exit: $? $(date)"
grep -E "pass|identity|TFLOP" /tmp/flagship_r5/r5.log

# Rank-6 HBM-headroom trims for the throttled schedule: 1.5 GB of
# backlog on top of root groups + sharded blocks + output OOMed; these
# settings complete (see run_flagships_r6only.sh for the bisection).
export SYMTENSOR_BASIS_INFLIGHT_BYTES=1000000000
export SYMTENSOR_FLAGSHIP_BLOCK_ELEMS=1800000000
export SYMTENSOR_BASIS_SEG_HARD_ELEMS=250000000

echo "=== rank-6 dim-100 (bf16, real fill + identity, 1 pass) $(date) ==="
SYMTENSOR_BASIS_VERBOSE=1 timeout 14400 \
  python benchmarks/basis_change_flagship.py 6 100 \
  > /tmp/flagship_r5/r6.log 2> /tmp/flagship_r5/r6.verbose.log
echo "rank-6 exit: $? $(date)"
grep -E "pass|identity|TFLOP" /tmp/flagship_r5/r6.log

echo "=== rank-6 dim-100 warm (fake fill, compiles cached) $(date) ==="
SYMTENSOR_FLAGSHIP_FAKE=1 SYMTENSOR_BASIS_VERBOSE=1 timeout 7200 \
  python benchmarks/basis_change_flagship.py 6 100 \
  > /tmp/flagship_r5/r6warm.log 2> /tmp/flagship_r5/r6warm.verbose.log
echo "rank-6 warm exit: $? $(date)"
grep -E "pass|identity|TFLOP" /tmp/flagship_r5/r6warm.log
echo "=== done $(date) ==="
