#!/usr/bin/env bash
# Per-file test runner: each test file gets its OWN pytest process.
#
# Why: (a) the XLA CPU compiler can rarely SEGFAULT deep into a long
# single-process run (seen in rounds 3/4, different tests each time, inside
# backend_compile_and_load); per-file processes turn that from a suite-abort
# into one retryable file. (b) per-file wall times are printed, so slow
# creep is visible.
#
# Usage:
#   tests/run_suite.sh            # FAST tier: 'not slow and not heavy' (<5 min warm, CI default)
#   tests/run_suite.sh --heavy    # fast + heavy: the 'not slow' subset (~15 min)
#   tests/run_suite.sh --slow     # everything, incl. full-geometry smokes
#   tests/run_suite.sh tests/test_foo.py [...]   # explicit files (fast tier)
#
# The fast tier runs ONE grouped pytest process (the ~3-4 s python+jax
# startup per file is ~100 s across 29 files — a third of the tier's wall);
# --heavy/--slow keep per-file processes so (a) the rare XLA-CPU segfault
# deep into a long run aborts one retryable file, not the suite, and (b)
# per-file wall times stay visible for slow-creep tracking.
# A process that fails is retried ONCE (covers the known segfault flake); a
# second failure fails the suite.
set -u
cd "$(dirname "$0")/.."

EXPR="not slow and not heavy"
if [[ "${1:-}" == "--slow" ]]; then
    EXPR=""
    shift
elif [[ "${1:-}" == "--heavy" ]]; then
    EXPR="not slow"
    shift
fi
if [[ $# -gt 0 ]]; then
    FILES=("$@")
else
    FILES=(tests/test_*.py)
fi

if [[ "$EXPR" == "not slow and not heavy" ]]; then
    t0=$(date +%s)
    out=$(python -m pytest "${FILES[@]}" -q -m "$EXPR" 2>&1)
    rc=$?
    if [[ $rc -ne 0 && $rc -ne 5 ]]; then
        echo "== RETRY fast tier (rc=$rc) — tail of first attempt:"
        echo "$out" | tail -10
        out=$(python -m pytest "${FILES[@]}" -q -m "$EXPR" 2>&1)
        rc=$?
    fi
    t1=$(date +%s)
    echo "$out" | tail -3
    echo "----"
    echo "suite wall: $((t1 - t0))s  overall rc=$rc  (fast tier, single process)"
    exit $rc
fi

total_rc=0
total_t0=$(date +%s)
declare -a SUMMARY
for f in "${FILES[@]}"; do
    t0=$(date +%s)
    if [[ -n "$EXPR" ]]; then
        out=$(python -m pytest "$f" -q -m "$EXPR" 2>&1)
    else
        out=$(python -m pytest "$f" -q 2>&1)
    fi
    rc=$?
    if [[ $rc -ne 0 && $rc -ne 5 ]]; then
        echo "== RETRY $f (rc=$rc) — tail of first attempt:"
        echo "$out" | tail -5
        if [[ -n "$EXPR" ]]; then
            out=$(python -m pytest "$f" -q -m "$EXPR" 2>&1)
        else
            out=$(python -m pytest "$f" -q 2>&1)
        fi
        rc=$?
    fi
    t1=$(date +%s)
    line=$(echo "$out" | tail -1)
    printf '%-40s %4ds  rc=%d  %s\n' "$f" "$((t1 - t0))" "$rc" "$line"
    SUMMARY+=("$f:$((t1 - t0))s:rc=$rc")
    if [[ $rc -ne 0 && $rc -ne 5 ]]; then   # 5 = no tests collected (all slow)
        total_rc=1
        echo "$out" | tail -20
    fi
done
total_t1=$(date +%s)
echo "----"
echo "suite wall: $((total_t1 - total_t0))s  overall rc=$total_rc"
exit $total_rc
