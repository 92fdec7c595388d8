#!/bin/bash
# Bonus rank-6 config: one t=1 window per row (w=100) — amortizes the
# per-row g-loop sweep and roughly halves t=1/k=3 dispatch counts.
# Two zeros-fill runs: the first pays the new-shape compiles, the second
# is the warm number.  Identity correctness at this schedule is covered
# by the real-fill 676 s run (same kernels, different window widths) and
# the CPU oracle tests (tests/test_symalg.py per-row path).
set -u
cd /root/repo
export SYMTENSOR_BASIS_INFLIGHT_BYTES=600000000
export SYMTENSOR_FLAGSHIP_BLOCK_ELEMS=1400000000
export SYMTENSOR_BASIS_SEG_HARD_ELEMS=200000000
export SYMTENSOR_BASIS_ROWS=2:100
export SYMTENSOR_BASIS_ROW_WINDOW=100
export SYMTENSOR_FLAGSHIP_FAKE=1
for leg in cold warm; do
  echo "=== rank-6 wide-row $leg $(date) ==="
  SYMTENSOR_BASIS_VERBOSE=1 timeout 10800 \
    python benchmarks/basis_change_flagship.py 6 100 \
    > /tmp/flagship_r5/r6wide.$leg.log \
    2> /tmp/flagship_r5/r6wide.$leg.verbose.log
  echo "exit: $? $(date)"
  grep -E "pass" /tmp/flagship_r5/r6wide.$leg.log
done
echo "=== done $(date) ==="
