#!/bin/bash
# N-vs-4N scaling protocol (BASELINE.md): the same extraction job (parquet
# scan → salted repartition → mapPartitions kernel → bucketed parquet
# commit + manifests) over the same pre-materialized input, at pinned CPU
# levels 2 / 8 / 32. Two N→4N readings per pair:
#   2→8   — both levels far below every single-VM ceiling (headline)
#   8→32  — reported transparently; on this shared hypervisor the
#           deliverable 8→32 capacity itself swings 2.0–3.4x (see cal
#           lines), so this reading measures host weather as much as the job
#
# Protocol controls (each was individually verified to matter):
#   * taskset pinning      — unpinned "local[8]" spends GC/JIT/commit
#                            threads on all 32 cores, inflating N
#   * tmpfs in/out         — a single virtio disk is not a cluster's
#                            storage; sink bandwidth must scale with cores
#   * pre-materialized     — generation cost out of the timed path; the
#     input                  north-rule job reads tables, it doesn't verify
#                            a generator
#   * sized scan splits    — ExtractMain sets maxPartitionBytes so the
#                            scan stage has ≥1 split per core (default
#                            128 MB splits capped a 1 GB input at 8 tasks)
#   * spin+stream cal      — per-pair pure-CPU and memory-bandwidth
#                            calibration kernels quantify what the host
#                            could deliver in that window
# Efficiency = (docsPerSec_4N / docsPerSec_N) / 4 on the quietest pair.
set -u
DOCS=${1:-200000}
PAIRS=${2:-3}
OUT=${GRAFT_SCALE_OUT:-/dev/shm/graft-scale}
INPUT=$OUT/input
mkdir -p "$OUT"

SPIN=/tmp/graft-cal
if [ ! -f "$SPIN/Spin.class" ]; then
  mkdir -p "$SPIN"
  cat > "$SPIN/Spin.java" <<'EOF'
public class Spin {
  public static void main(String[] a) throws Exception {
    int n = Integer.parseInt(a[0]); long ms = Long.parseLong(a[1]);
    long[] counts = new long[n]; Thread[] ts = new Thread[n];
    long end = System.currentTimeMillis() + ms;
    for (int i = 0; i < n; i++) { final int k = i;
      ts[i] = new Thread(() -> { long c = 0; long x = k + 1;
        while (System.currentTimeMillis() < end) {
          for (int j = 0; j < 100000; j++) x = x * 6364136223846793005L + 1442695040888963407L;
          c++; }
        counts[k] = c + (x == 42 ? 1 : 0); });
      ts[i].start(); }
    long tot = 0;
    for (int i = 0; i < n; i++) { ts[i].join(); tot += counts[i]; }
    System.out.println(tot);
  }
}
EOF
  cat > "$SPIN/StreamSum.java" <<'EOF'
public class StreamSum {
  public static void main(String[] a) throws Exception {
    int n = Integer.parseInt(a[0]); long ms = Long.parseLong(a[1]);
    final long[][] arrs = new long[n][];
    for (int i = 0; i < n; i++) arrs[i] = new long[8 * 1024 * 1024];
    long[] counts = new long[n]; Thread[] ts = new Thread[n];
    long end = System.currentTimeMillis() + ms;
    for (int i = 0; i < n; i++) { final int k = i;
      ts[i] = new Thread(() -> { long c = 0, s = 0;
        while (System.currentTimeMillis() < end) {
          long[] arr = arrs[k];
          for (int j = 0; j < arr.length; j++) s += arr[j];
          c++; }
        counts[k] = c + (s == 42 ? 1 : 0); });
      ts[i].start(); }
    long tot = 0;
    for (int i = 0; i < n; i++) { ts[i].join(); tot += counts[i]; }
    System.out.println(tot);
  }
}
EOF
  (cd "$SPIN" && javac Spin.java StreamSum.java)
fi

cpuset() { case "$1" in 2) echo 0-1;; 8) echo 0-7;; *) echo 0-31;; esac; }
cal() { taskset -c "$(cpuset "$1")" java -Xmx4g -cp "$SPIN" "$2" "$1" 4000; }

if [ ! -d "$INPUT" ]; then
  tools/run_extract.sh 32 "$DOCS" /dev/shm/unused m --materialize "$INPUT" >/dev/null 2>&1
fi
# warm-up, discarded
taskset -c 0-31 tools/run_extract.sh 32 "$DOCS" "$OUT/warm" warm --input "$INPUT" >/dev/null 2>&1

for RUN in $(seq 1 "$PAIRS"); do
  # third calibration: the actual extraction kernel on bare threads — no
  # Spark — captures the allocation/L3 ceiling spin+stream miss (a real
  # 4N-executor cluster multiplies memory hierarchies; one box cannot)
  CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
  kcal() { taskset -c "$(cpuset "$1")" java -Xmx8g -XX:+UseParallelGC -cp "$CP" graft.KernelCal "$1" "$2" \
             | grep -o '"docsPerSec":[0-9.]*' | cut -d: -f2; }
  echo "cal run=r$RUN spin2=$(cal 2 Spin) spin8=$(cal 8 Spin) spin32=$(cal 32 Spin) bw2=$(cal 2 StreamSum) bw8=$(cal 8 StreamSum) bw32=$(cal 32 StreamSum) kern2=$(kcal 2 40000) kern8=$(kcal 8 10000)"
  for CPUS in 2 8 32; do
    DIR="$OUT/c$CPUS-r$RUN"
    rm -rf "$DIR"
    LINE=$(taskset -c "$(cpuset $CPUS)" tools/run_extract.sh "$CPUS" "$DOCS" "$DIR" "r$RUN" --input "$INPUT" 2>/dev/null | grep -o '{"docs".*}')
    echo "cpus=$CPUS run=r$RUN $LINE"
  done
done
rm -rf "$OUT"  # tmpfs hygiene
