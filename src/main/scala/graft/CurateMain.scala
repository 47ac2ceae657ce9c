package graft

import graft.operators.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point for the corpus-curation pipeline — the
  * deployment surface of the `corpus_curate` flagship query: raw
  * documents table in → deduplicated, quality-filtered, split,
  * token-packed training shards out, partitioned by split on disk.
  *
  * Usage:
  *   graft.CurateMain <documentsParquet> <outDir>
  *
  * Reads a parquet table with (doc_id: long, text: string), runs
  * quality gate → exact dedup → MinHash-LSH → connected components →
  * keeper selection → 90/10 train/val split → token-budget shard
  * packing ([[Curation.curateStages]]), writes the packed table
  * partitioned by `split`, and prints ONE JSON line of per-stage counts
  * (what each stage removed) + wall time — the lineage observables a
  * curation run ships with. Every stage is deterministic (salted hashes,
  * no rand()), so reruns over the same input produce byte-identical
  * splits and shards.
  */
object CurateMain {
  def main(args: Array[String]): Unit = {
    val input  = args.headOption.getOrElse("/root/testdata/sf0.01/documents.parquet")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-curate-out"

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0     = System.nanoTime()
    val corpus = spark.read.parquet(input).select(col("doc_id"), col("text"))
    val nRaw   = corpus.count()
    val stages = Curation.curateStages(corpus, Curation.packBucketsFor(nRaw))

    stages.packed.write.mode("overwrite").partitionBy("split").parquet(outDir)

    // per-stage counts: deduped/clusters are checkpoint/materialized by
    // the chain, packed is read back from the table just written — no
    // stage recomputes for its count
    val nDeduped  = stages.deduped.count()
    val nClusters = stages.clusters.select(col("cluster_id")).distinct().count()
    val written   = spark.read.parquet(outDir)
    val nKept     = written.count()
    val nShards = written
      .select(col("split"), col("bucket"), col("shard")).distinct().count()
    val nTrain  = written.filter(col("split") === "train").count()
    val wallSec = (System.nanoTime() - t0) / 1e9

    println(
      f"""{"docsIn":$nRaw,"afterQualityAndExact":$nDeduped,""" +
        f""""nearDupClusters":$nClusters,"keepers":$nKept,""" +
        f""""train":$nTrain,"val":${nKept - nTrain},"shards":$nShards,""" +
        f""""wallSec":$wallSec%.3f,"docsPerSec":${nRaw / wallSec}%.1f}""")
    spark.stop()
  }
}
