package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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


    // --- suffix-lcp decomposition: plumbing vs LCP expression cost ---
    {
      val SuffixKeyToks = 16; val SuffixKeyChars = 64
      import org.apache.spark.sql.expressions.Window
      def dup(s0: SparkSession): DataFrame = {
        val d = s0.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
        d.unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zzz")).as("text")))
      }
      val t0f = graft.operators.Par.fanOut(dup(spark))
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      val suf = t0f.select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - 1), p =>
          substring(array_join(slice(col("toks"), p + 1, lit(SuffixKeyToks)), " "),
            1, SuffixKeyChars))).as("key"))
      val bucketed = suf.withColumn("bucket", substring(col("key"), 1, 2))
      val wb = Window.orderBy(col("bucket"))
      val bounds = bucketed.groupBy(col("bucket"))
        .agg(min(col("key")).as("bmin"), max(col("key")).as("bmax"))
        .select(col("bucket"),
          lag(col("bmax"), 1).over(wb).as("prev_max"),
          lead(col("bmin"), 1).over(wb).as("next_min"))
      def mmOf(a: Column, b: Column, w: Column): Column =
        array_position(transform(sequence(lit(1), w),
          i => a.substr(i, lit(1)) === b.substr(i, lit(1))), false)
      def lcpOf(a: Column, b: Column): Column = {
        val w = least(length(a), length(b))
        when(b.isNull, lit(0L)).when(w === 0, lit(0L)).when(a === b, w.cast("long"))
          .when(mmOf(a, b, w) === 0L, w.cast("long"))
          .otherwise(mmOf(a, b, w) - 1L)
      }
      val wk = Window.partitionBy(col("bucket")).orderBy(col("key"), col("doc_id"))
      def pipe(dupLen: (Column, Column, Column, Column) => Column): DataFrame =
        bucketed.join(broadcast(bounds), Seq("bucket"))
          .withColumn("nk", coalesce(lead(col("key"), 1).over(wk), col("next_min")))
          .withColumn("pk", coalesce(lag(col("key"), 1).over(wk), col("prev_max")))
          .withColumn("dup_len", dupLen(col("key"), col("nk"), col("key"), col("pk")))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_suffixes"),
            max(col("dup_len")).cast("long").as("max_dup_len"),
            count(when(col("dup_len") >= 30, 1)).as("n_dup_spans"))
      t("lcp: plumbing only")(noop(pipe((a, nk, _, pk) => length(a).cast("long"))))
      t("lcp: eq-fastpath only")(noop(pipe((a, nk, _, pk) =>
        greatest(when(a === nk, least(length(a), length(nk))).otherwise(lit(0)).cast("long"),
          when(a === pk, least(length(a), length(pk))).otherwise(lit(0)).cast("long")))))
      t("lcp: full")(noop(pipe((a, nk, _, pk) =>
        greatest(lcpOf(a, nk), lcpOf(a, pk)))))
    }


    // --- streaming replay phase decomposition (stream_events_window) ---
    (0 until 2).foreach { rep =>
      import java.sql.Timestamp
      import graft.streaming.StreamingOps
      import graft.streaming.StreamingOps.SpanEvent
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      import ss.implicits._
      implicit val sq = ss.sqlContext
      var t0 = System.nanoTime()
      def lap(m: String): Unit = {
        if (rep == 1) println(f"  sew: $m%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
      }
      val rows = ss.read.parquet(s"$sfDir/events.parquet")
        .select(col("ts").cast("timestamp").as("event_time"),
          col("event_id").cast("string").as("doc_id"), col("event_type").as("kind"))
        .as[SpanEvent].collect()
        .sortBy(e => (e.event_time.getTime, e.doc_id))
      lap("collect+sort")
      val maxTs = rows.map(_.event_time.getTime).max
      val in = MemoryStream[SpanEvent]
      val name = s"sewprobe_$rep"
      val q = StreamingOps.windowedKindCounts(in.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      lap("start")
      val half = math.max(1, (rows.length + 1) / 2)
      rows.grouped(half).foreach { b => in.addData(b.toSeq); q.processAllAvailable(); lap("batch") }
      in.addData(SpanEvent(new Timestamp(maxTs + 3600L * 1000), "::s::", "::sentinel::"))
      q.processAllAvailable()
      lap("sentinel")
      q.stop()
      lap("stop")
      ss.table(name).filter(col("kind") =!= "::sentinel::").write.format("noop").mode("overwrite").save()
      lap("result read")
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
