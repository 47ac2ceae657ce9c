package graft

import graft.plans.{ExtractJob, GoldenDiff, LineageAccumulator, ManifestIO}
import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the extraction pipeline (BASELINE.json
  * north_rule: "spark-submit-driven at scale ... salted repartitioning,
  * per-partition checkpoint manifests for resume, per-partition lineage +
  * throughput metrics; reruns idempotent").
  *
  * Usage:
  *   graft.ExtractMain <nDocs> <seed> <outDir> [runId] [--check]
  *
  * Reads nothing external: the input corpus is generated distributed from
  * (idx, seed) — swap `generateInputs` for a parquet/Iceberg scan in a
  * real deployment. With `--check`, also verifies the north-rule golden
  * invariant (span-sequence equality) and prints the match rate.
  * Exit code 1 if the check fails.
  */
object ExtractMain {
  def main(args: Array[String]): Unit = {
    val nDocs  = args.headOption.map(_.toLong).getOrElse(10000L)
    val seed   = if (args.length > 1) args(1).toLong else 42L
    val outDir = if (args.length > 2) args(2) else "/tmp/graft-extract-out"
    val runId  = if (args.length > 3 && !args(3).startsWith("--")) args(3) else s"run-$nDocs-$seed"
    val check  = args.contains("--check")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lineage = new LineageAccumulator
    spark.sparkContext.register(lineage, "extract-lineage")

    val parts = cpus.toInt * 2 // 2 waves per core: keeps stragglers short
    val t0    = System.nanoTime()
    val input = ManifestIO.pruneCommitted( // resume: skip committed buckets pre-kernel
      ExtractJob.generateInputs(spark, nDocs, seed, parts), outDir, nBuckets = parts)
    val out   = ExtractJob.extract(input, numPartitions = parts, lineage = Some(lineage))
    val committed = ManifestIO.write(out, outDir, nBuckets = parts, runId = runId)
    val wallSec   = (System.nanoTime() - t0) / 1e9

    val stats   = lineage.value
    val docs    = stats.values.map(_.docs).sum
    val spans   = stats.values.map(_.spans).sum
    val errors  = stats.values.map(_.errors).sum
    val docsSec = if (wallSec > 0) docs / wallSec else 0.0
    println(f"""{"docs":$docs,"spans":$spans,"errors":$errors,"partitions":${stats.size},""" +
      f""""bucketsCommitted":${committed.size},"wallSec":$wallSec%.3f,"docsPerSec":$docsSec%.1f}""")

    var ok = true
    if (check) {
      val goldens     = ExtractJob.generateGoldens(spark, nDocs, seed, parts)
      val (total, eq) = GoldenDiff.matchRate(ManifestIO.read(spark, outDir), goldens)
      println(s"""{"goldenDocs":$total,"matching":$eq,"equalityPct":${100.0 * eq / math.max(total, 1)}}""")
      ok = total == eq
    }
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
