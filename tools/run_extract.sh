#!/bin/bash
# Direct-JVM launcher for graft.ExtractMain: same --add-opens set as
# build.sbt, no sbt startup (25s → ~3s per run) so the scaling protocol can
# afford many interleaved samples on this noisy shared host.
# Usage: run_extract.sh <cpus> <docs> <outDir> <runId> [extra ExtractMain flags...]
set -eu
CPUS=$1; DOCS=$2; OUTDIR=$3; RUNID=$4; shift 4
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Heap CEILING scales with the parallelism level (2 GB/core, floor 8 GB):
# an N->4N executor comparison multiplies executor heap by 4 on a real
# cluster, so the single-JVM analog must too — a fixed ceiling turns the
# high-core level into a GC benchmark (measured: 23 s GC at 8 cores vs
# 0.8 s at 2 cores in the scan stage with a fixed 8 GB heap).
# Xms stays SMALL: committing a big Xms up front tanks throughput 4-5x on
# this hypervisor (interleaved A/B at 8 cores: -Xms16g -Xmx16g = 1535
# docs/s, kernel wall inflated 6x; -Xms4g -Xmx16g = 7740 docs/s) —
# host-side faulting of freshly committed pages is the poison; lazy heap
# growth is fine… UP TO A POINT: the ceiling is CAPPED at 16 GB because a
# 64 GB ceiling at 32 cores lets the allocation burst grow the heap so
# fast that hypervisor page-commit faulting dominates — measured round 3
# (same input, same minute): Xmx64g = 293.7 docs/s with kernelCpuSec 3871
# (13x the real work, all page-fault system time attributed to kernel
# threads); Xmx16g = 3627.6 docs/s, kernelCpuSec 346.9. This pathology is
# what round-2's "all 32-core windows host-stolen" actually was in part —
# round 2 is also the round that introduced the uncapped heap∝cores rule.
# (A real 4N-executor cluster multiplies heap across 4x JVMs on 4x
# machines; one VM faulting one giant heap through one hypervisor is a
# sandbox artifact, not the cluster analog.)
CEIL=$(( CPUS * 2 > 8 ? CPUS * 2 : 8 ))
MEM="${SPARK_DRIVER_MEM:-$(( CEIL > 16 ? 16 : CEIL ))g}"
# ParallelGC, not G1 (the JDK17 default): at 32 cores on this hypervisor
# G1's concurrent machinery burns kernel-thread system CPU catastrophically
# — A/B same input, same minute: G1 = 914 docs/s kernelCpuSec 1309;
# ParallelGC = 4058 docs/s kernelCpuSec 317. At 2-8 cores the two are
# equivalent; ParallelGC (Spark's classic throughput recommendation) is
# strictly better here and keeps kernelCpuSec in the valid band at 32.
GC="${SPARK_GC:--XX:+UseParallelGC}"
# SPARK_EXTRA_OPTS: ad-hoc -Dspark.* conf overrides for A/B runs
# (SparkConf loads spark.*-prefixed system properties).
exec env SPARK_GRAFT_CPUS="$CPUS" SPARK_LOCAL_DIRS="${SPARK_LOCAL_DIRS:-/dev/shm/spark-local}" \
  java $OPENS -Xms4g -Xmx"$MEM" $GC ${SPARK_EXTRA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.ExtractMain "$DOCS" 42 "$OUTDIR" "$RUNID" "$@"
