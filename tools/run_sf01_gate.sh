#!/bin/bash
# One-run full sf0.1 gate (VERDICT r9 item 3): Verify dump at sf0.1,
# then the DuckDB oracle compare over every query, written as a single
# artifact. Launch DETACHED (nohup) — the check phase runs ~3h at this
# suite size and must not share cores with Bench/StressBench.
set -u
cd /root/repo
OUT=${2:-/tmp/verify_sf01_r10}
ART=${1:-/root/repo/CHECK_SF01_173q.json}
rm -rf "$OUT"
SPARK_GRAFT_CPUS=32 java -Xmx96g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/testdata/sf0.1 "$OUT" > /tmp/sf01_dump.log 2>&1
if grep -q "\[verify\].*failed" /tmp/sf01_dump.log; then
  echo "DUMP FAILURES:" >&2
  grep "\[verify\].*failed" /tmp/sf01_dump.log >&2
fi
python3 tools/check.py /root/testdata/sf0.1 "$OUT" \
  > "$ART.tmp" 2>/tmp/sf01_check.err \
  && mv "$ART.tmp" "$ART"
tail -1 "$ART" 2>/dev/null
