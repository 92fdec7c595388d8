#!/bin/bash
# Rank-6 legs only, with HBM-headroom trims for the throttled schedule:
#  - backlog 0.6 GB, blocks 1.4e9 elems, segment workspace 200M elems:
#    1.0 GB/1.8e9/250M STILL OOMed ~1 h in (arena fragmentation under
#    ~300 GB of varied-size churn eats ~1.5 GB of the 16 GB HBM);
#    accounting now leaves ~2 GB of slack
set -u
mkdir -p /tmp/flagship_r5
cd /root/repo
export SYMTENSOR_BASIS_INFLIGHT_BYTES=600000000
export SYMTENSOR_FLAGSHIP_BLOCK_ELEMS=1400000000
export SYMTENSOR_BASIS_SEG_HARD_ELEMS=200000000

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
