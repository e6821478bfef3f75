#!/bin/bash
# Lint/format gate — the rebuild's analog of the reference's format.sh
# (clang-format hook).  Uses whatever is available in the environment and
# degrades gracefully: syntax-compiles all Python, syntax+warning-checks
# the native C++, and enforces basic hygiene (no tabs in .py, no trailing
# whitespace).  Exits non-zero on any finding.
set -u
cd "$(dirname "$0")"
rc=0

echo "== python: compileall =="
python -m compileall -q mvtrim_tpu tests benchmarks parity/harness.py \
    bench.py __graft_entry__.py || rc=1

echo "== python: optional linters =="
if command -v ruff >/dev/null 2>&1; then
    ruff check mvtrim_tpu tests benchmarks || rc=1
elif python -c "import flake8" 2>/dev/null; then
    python -m flake8 --max-line-length=100 mvtrim_tpu tests benchmarks || rc=1
else
    echo "(ruff/flake8 not installed — skipped)"
fi

echo "== native: g++ -fsyntax-only -Wall -Wextra =="
g++ -fsyntax-only -std=c++20 -Wall -Wextra \
    -I/usr/include/x86_64-linux-gnu native/mvtrim_host.cpp || rc=1

echo "== hygiene: tabs / trailing whitespace =="
if grep -rnP "\t" --include="*.py" mvtrim_tpu tests benchmarks; then
    echo "tabs found in Python sources"; rc=1
fi
if grep -rnP " +$" --include="*.py" --include="*.cpp" \
        mvtrim_tpu tests benchmarks native; then
    echo "trailing whitespace found"; rc=1
fi

[ "$rc" -eq 0 ] && echo "OK" || echo "FINDINGS (rc=$rc)"
exit "$rc"
