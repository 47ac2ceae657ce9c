package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-capture companion to the (frozen) [[Bench]] main — guide §1:
  * record `.explain("formatted")` for named catalog queries so plan-shape
  * claims (Exchange counts, join strategies, PushedFilters) are checkable
  * artifacts, not assertions. Timing stays in [[Bench]] (its
  * `SPARK_GRAFT_ONLY` subset mode); this main only materializes plans.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <outDir> <suffix> q1,q2,...
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    graft.operators.ExtractQueries.auxWrites = false
    qlist.split(",").filter(_.nonEmpty).foreach { name =>
      val plan =
        try SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case scala.util.control.NonFatal(e) => s"ERROR: $e" }
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      spark.catalog.clearCache()
      System.err.println(s"[benchextra] wrote $name")
    }
    spark.stop()
  }
}
