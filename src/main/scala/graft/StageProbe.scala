package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-decomposition probe for the LSH-chain queries (guide §1: measure
  * where the slowest catalog entries actually spend their time before
  * touching anything). Times named catalog queries warm (median of 3)
  * under the Bench session conf, plus the LSH / LSH+CC decomposition on
  * the keep-best corpus. Timing-only scaffolding; the measured surfaces
  * stay in the operators. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qlist = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES",
      "dedup_keep_best,corpus_curate,q_split_leakage").split(",").filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def kbCorpus: DataFrame = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      d.select(col("doc_id"),
          when(col("doc_id") % 2 === 1, concat(col("text"), lit(" !! ?? !! ?? !!")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    }
    def t(tag: String)(body: => Unit): Unit = {
      val secs = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        body
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s ${secs.sorted.apply(1)}%.3f s  (${secs.map(x => f"$x%.2f").mkString(",")})")
    }

    val tag = Some(s"$sfDir#probe-kb")
    t("kb lsh")(noop(graft.operators.Dedup.minhashLsh(kbCorpus, tag)))
    t("kb lsh+CC")(noop(graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.minhashLsh(kbCorpus, tag).select("doc_a", "doc_b"))))
    qlist.foreach { q =>
      t(q)(noop(SparkEntry.queries(q)(spark, sfDir)))
    }

    // --- round-level timing of the CC loop (replica, probe-only) ---
    {
      val pairs = graft.operators.Dedup.minhashLsh(kbCorpus, tag).select("doc_a", "doc_b")
      def ckpt(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
      var t0 = System.nanoTime()
      def lap(m: String): Unit = {
        println(f"  cc-round: $m%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
      }
      val sym = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val nodes = sym.select(col("src").as("id")).distinct()
      val edges = ckpt(sym.unionByName(nodes.select(col("id").as("src"), col("id").as("dst"))))
      var labels = ckpt(nodes.withColumn("label", col("id")))
      def sumOf(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
      var prev = sumOf(labels)
      lap("init+sum")
      var converged = false
      var iter = 0
      while (!converged && iter < 25) {
        val l1 = edges.as("e").join(labels.as("l"), col("e.src") === col("l.id"))
          .groupBy(col("e.dst").as("id")).agg(min(col("l.label")).as("l1"))
        val next = ckpt(l1.as("a")
          .join(l1.select(col("id").as("cid"), col("l1").as("cl")).as("b"),
            col("a.l1") === col("b.cid"), "left")
          .select(col("a.id").as("id"),
            least(col("a.l1"), coalesce(col("cl"), col("a.l1"))).as("label")))
        val cur = sumOf(next)
        converged = cur.compareTo(prev) == 0
        prev = cur
        labels = next
        iter += 1
        lap(s"round $iter")
      }
    }
    spark.stop()

  }
}
