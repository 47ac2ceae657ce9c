package graft

import graft.functions.TextKernels._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition bench of the dedup_novelty chain: isolates the
  * filter-pushdown blowup (a predicate on a derived HOF column gets the
  * whole interpreted expression tree substituted into it). Protocol as
  * [[SigProbe]]: third run reported (first measured too, to catch
  * one-shot pathologies). */
object NovProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d0 = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val dup = d0.unionByName(d0.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" zzz")).as("text")))
    def t(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-34s first ${times.head}%7.3f s   third ${times.last}%7.3f s")
    }
    val base = dup.withColumn("th", tokenHashes(tokens(col("text"))))
      .select(col("doc_id"), array_distinct(shingleHashes(col("th"))).as("sh"))
    t("shingle sets, no filter")(base)
    t("sh-filter AFTER (pushdown)")(base.filter(size(col("sh")) > 0))
    t("cheap filter BEFORE")(
      dup.filter(size(tokens(col("text"))) >= 3)
        .withColumn("th", tokenHashes(tokens(col("text"))))
        .select(col("doc_id"), array_distinct(shingleHashes(col("th"))).as("sh")))
    spark.stop()
  }
}
