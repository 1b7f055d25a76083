#!/usr/bin/env bash
# r10 verdict item 1: q17 pair-stage slice A/B at sf10.
# Runs DiagQ17Slices as N sequential core/memory-capped JVMs per N in {1,2,4}:
# each slice gets 32/N cores and 96/N GB heap and processes the
# pmod(hash(user_id), N) == k shard of the basket space — one machine of an
# N-node cluster. Confirms the "a cluster distributes the residual" claim iff
# per-slice cost ~= (N=1 cost)/N. Must run on an otherwise idle box.
set -u
SF_DIR="${1:-target/testdata/sf10}"
OUT="${2:-target/q17_slices_sf10.log}"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
: > "$OUT"
for N in 1 2 4; do
  CORES=$((32 / N))
  XMX=$((96 / N))g
  for K in $(seq 0 $((N - 1))); do
    echo "=== N=$N k=$K cores=$CORES xmx=$XMX ===" | tee -a "$OUT"
    SPARK_GRAFT_CPUS=$CORES java -Xmx$XMX $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.tools.DiagQ17Slices "$SF_DIR" "$N" "$K" 2 2>&1 \
      | grep -E "^\[slice" | tee -a "$OUT"
  done
done
echo "done" | tee -a "$OUT"
