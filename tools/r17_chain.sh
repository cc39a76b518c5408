#!/bin/bash
# r17 measurement chain — runs the round's sf100/sf10/sf0.1 sweeps
# SEQUENTIALLY in one detached process (each sweep wants an otherwise-idle
# machine). Each stage copies BENCH_last.json to its bench/ artifact name.
cd /root/repo || exit 1
CP="/tmp/graft_r17_classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
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
  echo "=== $(date -u +%H:%M:%S) start $art" >> /tmp/r17_chain.log
  # clear the previous stage's line first: a stage that dies before
  # printing must NOT get the previous artifact copied under its name (a
  # silently mislabeled artifact); note a nonzero rc alone doesn't mean
  # no artifact — Bench exits 1 on any failed query but still writes its
  # self-describing line
  rm -f BENCH_last.json
  env "${envs[@]}" java -Xmx64g $JAVA_FLAGS -cp "$CP" "$@" > "$log" 2>&1
  rc=$?
  [ -f BENCH_last.json ] && cp BENCH_last.json "$art"
  echo "=== $(date -u +%H:%M:%S) done  $art rc=$rc" >> /tmp/r17_chain.log
}

SUB20=$(cat /tmp/r17_sub20.txt)

# 1. sf100 full 2-pass, plain layout — the round-over-round continuity sweep
run /tmp/r17_sf100_full.log bench/r17_sf100_full.json \
  SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_NO_RETRY=1 SPARK_GRAFT_REF=bench/r16_sf100_full.json \
  -- graft.Bench

# 2. sf100 full 2-pass, bucketed-64 redirect armed for the WHOLE sweep
#    (VERDICT r16 item 5: does the isolated join-family win hold in-sweep,
#    and does anything else regress?)
run /tmp/r17_sf100_bucketed.log bench/r17_sf100_bucketed.json \
  SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BUCKETED_BUCKETS=64 \
  SPARK_GRAFT_NO_RETRY=1 SPARK_GRAFT_REF=bench/r16_sf100_full.json \
  -- graft.Bench

# 3. sf100 noise-floor sweep (VERDICT r16 item 6): 4 passes over the
#    sub-20s queries with per-sample emission, no retries
run /tmp/r17_noise_sf100.log bench/r17_noise_sf100_samples.json \
  SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_PASSES=4 SPARK_GRAFT_EMIT_SAMPLES=1 SPARK_GRAFT_NO_RETRY=1 \
  SPARK_GRAFT_ONLY="$SUB20" \
  -- graft.Bench

# 4. sf10 full 2-pass
run /tmp/r17_sf10_full.log bench/r17_sf10_full.json \
  SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_NO_RETRY=1 SPARK_GRAFT_REF=bench/r16_sf10_full.json \
  -- graft.Bench

# 5. sf0.1 full 2-pass (the driver's scale)
run /tmp/r17_local_sf01.log bench/r17_local_sf01.json \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REF=bench/r16_local_sf01_final2.json \
  -- graft.Bench

echo "=== $(date -u +%H:%M:%S) CHAIN COMPLETE" >> /tmp/r17_chain.log
