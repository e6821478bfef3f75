#!/bin/bash
# Stand-in ffmpeg for parity testing: copies the concat list (the -i
# argument) to $MVT_CONCAT_DUMP and succeeds without producing output.
prev=""
for arg in "$@"; do
  if [ "$prev" = "-i" ] && [ -n "${MVT_CONCAT_DUMP:-}" ]; then
    cp "$arg" "$MVT_CONCAT_DUMP"
  fi
  prev="$arg"
done
exit 0
