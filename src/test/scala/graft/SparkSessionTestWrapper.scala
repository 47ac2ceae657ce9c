package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (Test/fork := true in
  * build.sbt ⇒ one JVM per `sbt test` run). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSessionTestWrapper {
  lazy val spark: SparkSession = TestSpark.spark
}
