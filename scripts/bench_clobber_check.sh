#!/bin/bash
# Round-6 judge item 3: assert that a FILTERED `graft.Bench qA` run
# cannot overwrite the canonical BENCH_FULL.json (it must write
# BENCH_FULL.partial.json instead). Run from the repo root.
set -e
cd "$(dirname "$0")/.."
before=$(md5sum BENCH_FULL.json | cut -d' ' -f1)
rm -f BENCH_FULL.partial.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  sbt -batch "runMain graft.Bench q01_grouped_count" >/dev/null 2>&1
after=$(md5sum BENCH_FULL.json | cut -d' ' -f1)
if [ "$before" != "$after" ]; then
  echo "FAIL: filtered Bench run modified BENCH_FULL.json"; exit 1
fi
if [ ! -f BENCH_FULL.partial.json ]; then
  echo "FAIL: filtered Bench run did not write BENCH_FULL.partial.json"; exit 1
fi
rm -f BENCH_FULL.partial.json
echo "OK: filtered Bench run left canonical BENCH_FULL.json untouched"
