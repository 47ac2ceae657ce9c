package graft

import graft.plans.ExtractJob
import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and the extraction pipeline on a seeded corpus,
  * prints ONE JSON line:
  * `{"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...}`
  * plus extraction throughput fields (docs/sec at this parallelism — the
  * number BASELINE.md's N-vs-4N scaling efficiency is computed from; run
  * with SPARK_GRAFT_CPUS=8 and =32 for the two cluster sizes).
  *
  * Queries are forced end-to-end with the `noop` sink (count() would let
  * Catalyst prune the projections we mean to measure); one untimed warm-up
  * query amortizes session/codegen start-up out of the first measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runNoop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up (JVM/codegen/parquet footer caches) — not measured
    runNoop(spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { runNoop(fn(spark, sfDir)); true }
      catch { case scala.util.control.NonFatal(e) => System.err.println(s"[bench] $name: $e"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // extraction throughput at this parallelism (the BASELINE.md metric)
    val exN   = sys.env.getOrElse("SPARK_GRAFT_EXTRACT_DOCS", "40000").toLong
    val parts = cpus.toInt * 2
    val exT0  = System.nanoTime()
    ExtractJob.extract(ExtractJob.generateInputs(spark, exN, 42L, parts), parts)
      .toDF().write.format("noop").mode("overwrite").save()
    val exSec = (System.nanoTime() - exT0) / 1e9

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + exSec
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        f""""extract_docs":$exN,"extract_sec":$exSec%.3f,"extract_docs_per_sec":${exN / exSec}%.1f,"cpus":$cpus}""")
    spark.stop()
  }
}
