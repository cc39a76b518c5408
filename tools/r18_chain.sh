#!/bin/bash
# r18 measurement chain — runs the round's sf100/sf10/sf0.1 sweeps
# SEQUENTIALLY in one detached process (each sweep wants an otherwise-idle
# machine). Each stage copies BENCH_last.json to its bench/ artifact name.
cd /root/repo || exit 1

# --- disk-hygiene gate (r18, VERDICT r17 item 4) ------------------------
# r17's closing sweep lost q5_join to ENOSPC when 15 GB of prior-round
# bench debris (leftover bucketed warehouse + ~1000 temp stores) collided
# with q5's legitimate multi-GB shuffle spill. Purge the known debris
# classes, then FAIL FAST if free space is still under the floor: 25 GB
# ≈ 2× the largest historical spill (q5_join at sf100: 7.3 GB disk spill
# + staging), with headroom for the bucketed replica build.
echo "=== $(date -u +%H:%M:%S) disk hygiene" >> /tmp/r18_chain.log
rm -rf /tmp/graft_sigtable_* /tmp/graft_wh_* /tmp/graft_chunk_store_* \
  /tmp/graft_dupprof_* /tmp/graft_*store_* /tmp/graft_tt_* \
  /tmp/graft_fresh_* /tmp/lease_* /tmp/store_* /tmp/probe_* \
  /tmp/temporary-* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
FREE_GB=$(df --output=avail -BG /tmp | tail -1 | tr -dc '0-9')
if [ "$FREE_GB" -lt 25 ]; then
  echo "=== ABORT: ${FREE_GB}G free on /tmp < 25G floor" >> /tmp/r18_chain.log
  exit 2
fi
echo "=== $(date -u +%H:%M:%S) hygiene ok: ${FREE_GB}G free" >> /tmp/r18_chain.log

CP="/tmp/graft_r18_classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
JAVA_FLAGS="--add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

run() { # run LOG ARTIFACT [env pairs...] -- mainclass
  local log="$1" art="$2"; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $(date -u +%H:%M:%S) start $art" >> /tmp/r18_chain.log
  # clear the previous stage's line first: a stage that dies before
  # printing must NOT get the previous artifact copied under its name
  rm -f BENCH_last.json
  env "${envs[@]}" java -Xmx64g $JAVA_FLAGS -cp "$CP" "$@" > "$log" 2>&1
  rc=$?
  [ -f BENCH_last.json ] && cp BENCH_last.json "$art"
  echo "=== $(date -u +%H:%M:%S) done  $art rc=$rc" >> /tmp/r18_chain.log
}

# 1. sf100 full 2-pass, plain layout — round-over-round continuity, with
#    the NEW automated fresh-JVM receipt armed (VERDICT r17 item 3): a
#    ref-retried query that stays slow with quiet JIT gets a forked-JVM
#    re-measure recorded in the same artifact's "fresh_jvm" block.
run /tmp/r18_sf100_full.log bench/r18_sf100_full.json \
  SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_NO_RETRY=1 SPARK_GRAFT_REF=bench/r17_sf100_full.json \
  SPARK_GRAFT_FRESH_JVM=1 \
  -- graft.Bench

# 2. sf10 full 2-pass
run /tmp/r18_sf10_full.log bench/r18_sf10_full.json \
  SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_NO_RETRY=1 SPARK_GRAFT_REF=bench/r17_sf10_full.json \
  SPARK_GRAFT_FRESH_JVM=1 \
  -- graft.Bench

# 3. sf0.1 full 2-pass (the driver's scale)
run /tmp/r18_local_sf01.log bench/r18_local_sf01.json \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REF=bench/r17_local_sf01.json \
  -- graft.Bench

# 4. sf100 lifecycle refresh — the retrain-on-compact price changed this
#    round (multi-init: two bounded trainer towers + two distortion scans
#    instead of one k-means|| tower); re-price ivf_compact_retrain against
#    bench/r17_lifecycle_sf100.json. LifecycleBench prints its line to
#    stdout only, so capture from the log, not BENCH_last.json.
echo "=== $(date -u +%H:%M:%S) start lifecycle_sf100" >> /tmp/r18_chain.log
env SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_CPUS=32 \
  java -Xmx64g $JAVA_FLAGS -cp "$CP" graft.tools.LifecycleBench \
  > /tmp/r18_lifecycle_sf100.log 2>&1
grep -o '{"metric".*' /tmp/r18_lifecycle_sf100.log | tail -1 \
  > bench/r18_lifecycle_sf100.json
echo "=== $(date -u +%H:%M:%S) done  lifecycle_sf100 rc=$?" >> /tmp/r18_chain.log

echo "=== $(date -u +%H:%M:%S) CHAIN COMPLETE" >> /tmp/r18_chain.log
