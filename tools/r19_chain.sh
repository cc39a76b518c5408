#!/bin/bash
# r19 measurement chain — runs the round's sf100/sf10/sf0.1 sweeps
# SEQUENTIALLY in one detached process (each sweep wants an otherwise-idle
# machine). Each stage copies BENCH_last.json to its bench/ artifact name.
cd /root/repo || exit 1

# --- disk-hygiene gate (r18, VERDICT r17 item 4) ------------------------
echo "=== $(date -u +%H:%M:%S) disk hygiene" >> /tmp/r19_chain.log
rm -rf /tmp/graft_sigtable_* /tmp/graft_wh_* /tmp/graft_chunk_store_* \
  /tmp/graft_dupprof_* /tmp/graft_*store_* /tmp/graft_tt_* \
  /tmp/graft_fresh_* /tmp/graft_lc_* /tmp/graft_events_* /tmp/lease_* \
  /tmp/store_* /tmp/probe_* /tmp/churn_* /tmp/recover_* \
  /tmp/temporary-* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
FREE_GB=$(df --output=avail -BG /tmp | tail -1 | tr -dc '0-9')
if [ "$FREE_GB" -lt 25 ]; then
  echo "=== ABORT: ${FREE_GB}G free on /tmp < 25G floor" >> /tmp/r19_chain.log
  exit 2
fi
echo "=== $(date -u +%H:%M:%S) hygiene ok: ${FREE_GB}G free" >> /tmp/r19_chain.log

CP="/tmp/graft_r19_classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
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
  echo "=== $(date -u +%H:%M:%S) start $art" >> /tmp/r19_chain.log
  rm -f BENCH_last.json
  env "${envs[@]}" java -Xmx64g $JAVA_FLAGS -cp "$CP" "$@" > "$log" 2>&1
  rc=$?
  [ -f BENCH_last.json ] && cp BENCH_last.json "$art"
  echo "=== $(date -u +%H:%M:%S) done  $art rc=$rc" >> /tmp/r19_chain.log
}

# 1. sf100 full 2-pass, plain layout — round-over-round continuity. The
#    fresh-JVM receipt is armed with the NEW child-heap bound (r19,
#    ADVICE r18: an inherited 64g cap next to the resident parent heap
#    doubled the window's peak demand). REF_FACTOR=1.25 (r19, VERDICT
#    r18 item 6): the audit's own swing threshold — every >1.25× swing
#    gets an in-artifact resolution (ref-retry min back in band, or a
#    fresh_jvm receipt), closing the class the r18 joins needed a
#    hand-run remeasure for. The measured sf100 noise floor still
#    gates which queries qualify.
run /tmp/r19_sf100_full.log bench/r19_sf100_full.json \
  SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_NO_RETRY=1 SPARK_GRAFT_REF=bench/r18_sf100_full.json \
  SPARK_GRAFT_REF_FACTOR=1.25 \
  SPARK_GRAFT_FRESH_JVM=1 SPARK_GRAFT_FRESH_XMX=32g \
  -- graft.Bench

# 2. sf10 full 2-pass (same in-sweep resolution threshold)
run /tmp/r19_sf10_full.log bench/r19_sf10_full.json \
  SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_NO_RETRY=1 SPARK_GRAFT_REF=bench/r18_sf10_full.json \
  SPARK_GRAFT_REF_FACTOR=1.25 \
  SPARK_GRAFT_FRESH_JVM=1 SPARK_GRAFT_FRESH_XMX=16g \
  -- graft.Bench

# 3. sf0.1 full 2-pass (the driver's scale)
run /tmp/r19_local_sf01.log bench/r19_local_sf01.json \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REF=bench/r18_local_sf01.json \
  -- graft.Bench

# 4. FORCED fresh-JVM receipt in a real sweep (r19, VERDICT r18 item 2):
#    the r18 mechanism never tripped at grade, so the trigger→fork→
#    parse→artifact chain had no in-sweep evidence. A floor/factor set
#    below any real reading makes vec_normalize trip staysSlow by
#    construction; the artifact must carry a populated "fresh_jvm" block.
run /tmp/r19_freshjvm_receipt.log bench/r19_freshjvm_receipt.json \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY=vec_normalize \
  SPARK_GRAFT_REF=bench/r18_local_sf01.json \
  SPARK_GRAFT_REF_FACTOR=0.01 SPARK_GRAFT_REF_FLOOR=0.01 \
  SPARK_GRAFT_FRESH_JVM=1 SPARK_GRAFT_FRESH_XMX=8g \
  -- graft.Bench

# 5. sf100 lifecycle re-price — retrain's price changed again this round
#    (the PQ-codebook re-fit adds a bounded per-subspace trainer tower to
#    compactStore(retrain = true)); re-price against
#    bench/r18_lifecycle_sf100.json. LifecycleBench prints to stdout.
echo "=== $(date -u +%H:%M:%S) start lifecycle_sf100" >> /tmp/r19_chain.log
env SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_CPUS=32 \
  java -Xmx64g $JAVA_FLAGS -cp "$CP" graft.tools.LifecycleBench \
  > /tmp/r19_lifecycle_sf100.log 2>&1
grep -o '{"metric".*' /tmp/r19_lifecycle_sf100.log | tail -1 \
  > bench/r19_lifecycle_sf100.json
echo "=== $(date -u +%H:%M:%S) done  lifecycle_sf100 rc=$?" >> /tmp/r19_chain.log

echo "=== $(date -u +%H:%M:%S) CHAIN COMPLETE" >> /tmp/r19_chain.log
