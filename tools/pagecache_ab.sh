#!/usr/bin/env bash
# r10 verdict item 5: falsify/confirm the page-cache attribution of the sf10
# "3.7-4.9x band". For each entry, one COLD sf3 run (drop_caches immediately
# before) vs one WARM sf3 run (fresh JVM, data just touched) — if
# cold/warm at sf3 approaches the sf3->sf10 ratio, the band is the working
# set falling out of page cache, which a cluster pays once per machine.
# Single-round per run (cold is only cold once), isolated JVM per run.
set -u
SF_DIR="${1:-target/testdata/sf3}"
shift || true
ENTRIES=("${@:-q35_rfm_scores ck02_token_chunking q24_session_stats dd01_exact_dedup}")
[ $# -gt 0 ] && ENTRIES=("$@") || ENTRIES=(q35_rfm_scores ck02_token_chunking q24_session_stats dd01_exact_dedup)
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SFNAME=$(basename "$SF_DIR")
run_one() { # entry
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_ONLY="$1" \
  SPARK_GRAFT_BENCH_ROUNDS=1 SPARK_GRAFT_CPUS=32 \
  java -Xmx48g $ADD_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    >/dev/null 2>&1
  python3 -c "import json;d=json.load(open('target/bench_${SFNAME}_filtered.json'));print(d['queries']['$1'])"
}
for e in "${ENTRIES[@]}"; do
  # prime (populate the cache, discarded), then measure warm, then cold
  run_one "$e" >/dev/null
  warm=$(run_one "$e")
  sync; echo 3 > /proc/sys/vm/drop_caches
  cold=$(run_one "$e")
  echo "[pagecache] $e warm=${warm}s cold=${cold}s ratio=$(python3 -c "print(round($cold/$warm,2))")"
done
