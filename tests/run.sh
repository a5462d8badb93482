#!/bin/sh
# Process-isolated test runner: one pytest subprocess per test file.
#
# `python -m pytest tests/ -q` is the canonical command and passes with
# the conftest.py XLA stability flags (serialized LLVM codegen, per-module
# executable-cache clearing). This runner is the belt-and-braces variant
# for hosts where XLA's CPU compiler still crashes under hundreds of
# accumulated compiles in one process (SIGSEGV/SIGABRT inside
# backend_compile_and_load, position varying run to run): each file gets
# a fresh process, so one file's compiler-state corruption cannot take
# down the rest. rc=0 iff every file passes.
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
    echo "=== $f"
    python -m pytest "$f" -q || fail=1
done
exit $fail
