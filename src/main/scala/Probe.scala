object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${16*1024*1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val in = args(0)
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    val parts = cpus.toInt * 2
    import spark.implicits._
    noop(spark.read.parquet(in).limit(1000).toDF())
    t("scan->noop")            { noop(spark.read.parquet(in)) }
    t("scan->repart->noop")    { noop(spark.read.parquet(in).repartition(parts, hash(col("doc_id")))) }
    t("scan->repart->ident")   { noop(spark.read.parquet(in).repartition(parts, hash(col("doc_id"))).as[graft.Document].mapPartitions(it => it).toDF()) }
    t("full extract noop")     { noop(graft.plans.ExtractJob.extract(spark.read.parquet(in).as[graft.Document], parts).toDF()) }
    t("full extract parquet")  {
      val out = graft.plans.ExtractJob.extract(spark.read.parquet(in).as[graft.Document], parts)
      graft.plans.ManifestIO.write(out, s"/dev/shm/graft-kern/probe-$cpus", parts, runId = "probe"): Unit
    }
    spark.stop()
  }
}
