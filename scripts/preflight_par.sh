#!/bin/bash
# Dev-only: shard preflight.py keys across N parallel processes (each its
# own DuckDB connection) — the single-connection pass is latency-bound on
# a 976-key inventory at sf1. Usage: preflight_par.sh <sfDir> <outDir> <N>
SF=$1; OUT=$2; N=${3:-8}; KEYFILE=${4:-}
if [ -n "$KEYFILE" ]; then
  KEYS=$(tr ',' '\n' < "$KEYFILE")
else
  KEYS=$(python3 -c "import json;print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
fi
mkdir -p target/preflight_shards
rm -f target/preflight_shards/shard_*
echo "$KEYS" | awk -v n=$N '{print > ("target/preflight_shards/shard_" NR%n ".keys")}'
pids=""
REPO=$(pwd)
for i in $(seq 0 $((N-1))); do
  ks=$(paste -sd, target/preflight_shards/shard_$i.keys)
  # each shard runs from its own cwd: DuckDB spills to ./.tmp, and two
  # connections sharing one temp dir corrupt each other's spill files
  mkdir -p target/preflight_shards/wd_$i
  (cd target/preflight_shards/wd_$i &&
   python3 "$REPO/scripts/preflight.py" "$REPO/$SF" "$REPO/$OUT" "$ks" \
     > "$REPO/target/preflight_shards/shard_$i.log" 2>&1) &
  pids="$pids $!"
done
rc=0
for p in $pids; do wait $p || rc=1; done
cat target/preflight_shards/shard_*.log | grep -E "^(OK|FAIL)" | sort > target/preflight_shards/combined.log
echo "OK: $(grep -c '^OK' target/preflight_shards/combined.log)  FAIL: $(grep -c '^FAIL' target/preflight_shards/combined.log)"
exit $rc
