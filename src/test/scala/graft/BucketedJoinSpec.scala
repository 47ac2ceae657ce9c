package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located joins — the storage-side scale technique the
  * shuffle-heavy operators assume is available at 100 TB: writing both
  * sides of a recurring equi-join bucketed on the join key makes the join
  * a zero-Exchange zip of pre-sorted buckets. (The extraction pipeline's
  * own output is already bucketed this way via ManifestIO — `bucket =
  * pmod(hash(doc_id), n)` with one file per bucket — this spec pins the
  * query-side payoff using Spark's native bucketBy metadata.) */
class BucketedJoinSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("equi-join of two tables bucketed on the key plans with ZERO Exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucketed")
    wh.toFile.deleteOnExit()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    try {
      Seq("b_docs1", "b_docs2").foreach { t =>
        docs.write
          .bucketBy(8, "doc_id").sortBy("doc_id")
          .option("path", s"$wh/$t")
          .mode("overwrite")
          .saveAsTable(t)
      }
      // hint("merge") pins SortMergeJoin: at sf-test size the planner
      // would broadcast instead (which also avoids the shuffle, but the
      // bucketing payoff we're pinning is for two LARGE sides where
      // broadcast is impossible)
      val joined = spark.table("b_docs1").as("l").hint("merge")
        .join(spark.table("b_docs2").as("r").hint("merge"), Seq("doc_id"))
        .select(col("doc_id"), length(col("l.text")).as("a"), length(col("r.text")).as("b"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(count(plan, "Exchange") == 0,
        s"bucketed join still shuffles:\n${plan.take(3000)}")
      assert(joined.count() == docs.count())

      // contrast: the same join over the raw (unbucketed) parquet shuffles
      // BOTH sides — this is the cost bucketing removes
      val raw = docs.as("l").hint("merge").join(docs.as("r").hint("merge"), Seq("doc_id"))
      val rawPlan = raw.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan.toString
        case other => other.toString
      }
      assert(count(rawPlan, "Exchange") >= 2,
        s"expected the unbucketed merge join to shuffle both sides:\n${rawPlan.take(2000)}")
    } finally {
      Seq("b_docs1", "b_docs2").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
