#!/bin/bash
# Stand-in ffmpeg for parity testing: copies the concat list (the -i
# argument) to $MVT_CONCAT_DUMP, and/or to
# $MVT_CONCAT_DUMP_DIR/<output-basename>.concat (batch mode), then
# succeeds without producing output.  The output file is the last arg.
list=""
prev=""
for arg in "$@"; do
  if [ "$prev" = "-i" ]; then list="$arg"; fi
  prev="$arg"
done
out="${@: -1}"
if [ -n "$list" ]; then
  [ -n "${MVT_CONCAT_DUMP:-}" ] && cp "$list" "$MVT_CONCAT_DUMP"
  [ -n "${MVT_CONCAT_DUMP_DIR:-}" ] && \
    cp "$list" "$MVT_CONCAT_DUMP_DIR/$(basename "$out").concat"
fi
# Affinity probe: record which CPUs this child was confined to
# (tests MVT_CUT_CPUSET pinning, inherited from the spawning thread).
[ -n "${MVT_AFFINITY_DUMP:-}" ] && \
  grep Cpus_allowed_list /proc/self/status > "$MVT_AFFINITY_DUMP"
exit 0
