package graft

import graft.operators.{Sketches, Temporal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan-shape pins for the temporal joins (as-of, range) and
  * the sketch/sampling family. Cross-engine value equality is the DuckDB
  * oracle's job (q_asof_join is checked against DuckDB's NATIVE
  * `ASOF LEFT JOIN`); here we pin the boundary semantics on planted
  * micro-corpora and the physical shapes that decide 100 TB viability.
  */
class TemporalSketchSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  /** Write a micro events table (only the columns the temporal queries
    * read) and return its directory. */
  private def microEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-temporal").toString
    rows.toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("as-of join: latest view at-or-before, inclusive ties, null when none") {
    val S = 1000000L // 1 s in us
    val d = microEvents(Seq(
      (1L, 1000 * S, 1L, "view"),   // matched by click@2000
      (2L, 2000 * S, 1L, "click"),  // -> view 1, lag 1000 s
      (3L, 3000 * S, 1L, "view"),   // later view must NOT match click 2
      (4L, 4000 * S, 1L, "click"),  // -> view 3, lag 1000 s
      (5L, 500 * S, 2L, "click"),   // user 2 has no views -> null
      (6L, 700 * S, 3L, "view"),    // equal-ts tie: at-or-before is inclusive
      (7L, 700 * S, 3L, "click"))) // -> view 6, lag 0
    val out: Map[Long, (Option[Any], Option[Any])] =
      SparkEntry.queries("q_asof_join")(spark, d)
        .collect().map(r => r.getLong(0) -> ((Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(2L) == ((Some(1L), Some(1000 * S))))
    assert(out(4L) == ((Some(3L), Some(1000 * S))))
    assert(out(5L) == ((None, None)))
    assert(out(7L) == ((Some(6L), Some(0L))))
  }

  test("range join: inclusive start, exclusive end, bin-straddling intervals found once") {
    val W = Temporal.RangeWindowUs
    val e = W - 100 // error window [W-100, 2W-100) straddles bins 0 and 1
    val d = microEvents(Seq(
      (1L, e, 1L, "error"),
      (2L, e, 1L, "click"),          // gap 0: inclusive start
      (3L, e + W - 1, 1L, "click"),  // gap W-1: last in-window us
      (4L, e + W, 1L, "click"),      // gap W: exclusive end -> no match
      (5L, W + 50, 1L, "click"),     // lives in bin 1, matched via the 2nd exploded bin
      (6L, e + 10, 2L, "click")))    // other user -> no match
    val out = SparkEntry.queries("q_range_join")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out == Map(2L -> 0L, 3L -> (W - 1), 5L -> (W + 50 - e)))
  }

  test("as-of and range joins match an O(n^2) brute force on random corpora") {
    val rnd = new scala.util.Random(4242)
    val W   = Temporal.RangeWindowUs
    (1 to 3).foreach { trial =>
      // distinct (user, us) pairs — the events-table uniqueness invariant
      val keys = rnd.shuffle((0L until 4000L).toVector).take(600)
      val rows = keys.zipWithIndex.map { case (slot, i) =>
        val kind = rnd.nextInt(3) match {
          case 0 => "click"; case 1 => "view"; case 2 => "error"
        }
        // us spread across ~5 windows so ranges overlap bins both ways
        (i.toLong, slot * (W / 800), rnd.nextInt(5).toLong, kind)
      }
      val d = microEvents(rows)
      val clicks = rows.filter(_._4 == "click")
      val views  = rows.filter(_._4 == "view")
      val errors = rows.filter(_._4 == "error")

      val expAsof = clicks.map { c =>
        val m = views.filter(v => v._3 == c._3 && v._2 <= c._2)
          .sortBy(_._2).lastOption
        c._1 -> m.map(v => (v._1, c._2 - v._2))
      }.toMap
      val gotAsof = SparkEntry.queries("q_asof_join")(spark, d).collect()
        .map(r => r.getLong(0) ->
          Option(r.get(2)).map(v => (v.asInstanceOf[Long], r.getLong(3)))).toMap
      assert(gotAsof == expAsof, s"asof mismatch, trial $trial")

      val expRange = (for {
        c <- clicks; e <- errors
        if c._3 == e._3 && c._2 >= e._2 && c._2 < e._2 + W
      } yield (c._1, e._1, c._2 - e._2)).toSet
      val gotRange = SparkEntry.queries("q_range_join")(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(gotRange == expRange, s"range mismatch, trial $trial")
    }
  }

  test("as-of join is one shuffle and NO join node (the sort-merge-asof shape)") {
    val p = SparkEntry.queries("q_asof_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of planned a join node:\n${p.take(2000)}")
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"expected exactly 1 Exchange:\n${p.take(3000)}")
  }

  test("range join is an equi-join on (key, bin) — never cartesian/nested-loop") {
    val p = SparkEntry.queries("q_range_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degraded to a quadratic plan:\n${p.take(2000)}")
  }

  test("q_reservoir_sample: exact k smallest-hash docs per stratum, prefilter lossless") {
    def hex32d(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.toSeq.map { case (id, _) => (id, hex32d(s"$id|rsv")) }
        .sortBy { case (id, h) => (h, id) }.take(8).zipWithIndex
        .map { case ((id, h), i) => (src, id) -> ((h, i + 1L)) }
    }
    val wantM = want.toMap
    val out = SparkEntry.queries("q_reservoir_sample")(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("rh"), r.getAs[Long]("rn")))).toMap
    assert(out == wantM,
      s"diff: ${(out.keySet -- wantM.keySet) ++ (wantM.keySet -- out.keySet)}")
    // exactly k per stratum (every sf0.001 stratum has >= 8 docs)
    out.keySet.groupBy(_._1).foreach { case (src, ks) =>
      assert(ks.size == 8, s"stratum $src sampled ${ks.size} docs")
    }
    // prefilter keeps at least k survivors per stratum (the equivalence
    // precondition) — recomputed with the query's own threshold rule
    rows.groupBy(_._2).foreach { case (src, ds) =>
      val thr = math.min(1L << 32, 64L * (1L << 32) / ds.length)
      val survivors = ds.count { case (id, _) => hex32d(s"$id|rsv") < thr }
      assert(survivors >= 8, s"stratum $src prefilter kept only $survivors")
    }
  }

  test("HLL sketch: 512-register bound, rho range, map-side partial agg shuffle") {
    val regs = SparkEntry.queries("sketch_hll_registers")(spark, dir).cache()
    assert(regs.count() <= Sketches.M)
    val mm = regs.agg(min("rho"), max("rho")).head
    assert(mm.getLong(0) >= 1L && mm.getLong(1) <= (Sketches.WBits + 1).toLong)
    regs.unpersist()
    val p = SparkEntry.queries("sketch_hll_registers")(spark, dir)
      .queryExecution.executedPlan.toString
    // one Exchange, bounded at 512 rows by the map-side partial max
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1, p.take(3000))
    assert(p.contains("partial_max") || p.contains("HashAggregate"), p.take(2000))
  }

  test("HLL sketch merges: sketch(full) == max-merge of sketches of disjoint halves") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val full = Sketches.registersOf(ev)
    val merged = Sketches.registersOf(ev.filter(col("event_id") % 2 === 0))
      .unionByName(Sketches.registersOf(ev.filter(col("event_id") % 2 === 1)))
      .groupBy("reg").agg(max("rho").as("rho"))
    assert(full.exceptAll(merged).isEmpty && merged.exceptAll(full).isEmpty)
  }

  test("HLL estimate invariants: registers partition, estimate within the m=512 error bound") {
    val r = SparkEntry.queries("sketch_hll_estimate")(spark, dir).head
    val (mHit, vZero) = (r.getAs[Long]("m_hit"), r.getAs[Long]("v_zero"))
    assert(mHit + vZero == Sketches.M.toLong)
    val (est, exact) = (r.getAs[Double]("raw_estimate"), r.getAs[Long]("exact_distinct"))
    // raw estimator only: below 2.5m it carries the documented LC-regime
    // bias, so bound loosely at the small sf (driver sf sits in-regime)
    assert(est > 0 && exact > 0)
    if (exact > 2.5 * Sketches.M) assert(math.abs(est / exact - 1.0) < 0.15)
  }

  test("daily HLL rollup: merged total row == the global sketch's estimate") {
    val daily = SparkEntry.queries("sketch_hll_daily")(spark, dir).cache()
    val total = daily.filter(col("day_key") === -1L).head
    val global = SparkEntry.queries("sketch_hll_estimate")(spark, dir).head
    assert(total.getAs[Double]("raw_estimate") == global.getAs[Double]("raw_estimate"))
    assert(total.getAs[Long]("m_hit") == global.getAs[Long]("m_hit"))
    // per-day register partitions hold too
    assert(daily.filter(col("m_hit") + col("v_zero") =!= Sketches.M.toLong).count() == 0)
    daily.unpersist()
  }

  test("CMS never undercounts: est >= exact for EVERY token in the vocabulary") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    // estimate every token through the shipped counters
    val counters = Sketches.cmsCounters(spark, dir)
    val est = exact.withColumn("dg", md5(col("tok")))
      .select(col("tok"), col("exact_cnt"),
        explode(Sketches.cmsRowIdx(col("dg"))).as("ri"))
      .select(col("tok"), col("exact_cnt"),
        col("ri.row_j").as("row_j"), col("ri.idx").as("idx"))
      .join(counters, Seq("row_j", "idx"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
    assert(est.filter(col("cms_est") < col("exact_cnt")).count() == 0)
  }

  test("CMS merges: counters(full) == per-cell sum of counters over disjoint halves") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def cOf(df: org.apache.spark.sql.DataFrame) = {
      val d = java.nio.file.Files.createTempDirectory("graft-cms").toString
      df.write.mode("overwrite").parquet(s"$d/documents.parquet")
      Sketches.cmsCounters(spark, d)
    }
    val full = Sketches.cmsCounters(spark, dir)
    val merged = cOf(docs.filter(col("doc_id") % 2 === 0))
      .unionByName(cOf(docs.filter(col("doc_id") % 2 === 1)))
      .groupBy("row_j", "idx").agg(sum("cnt").as("cnt"))
    assert(full.exceptAll(merged).isEmpty && merged.exceptAll(full).isEmpty)
  }

  test("quantile histogram: bounded bins, <=10% relative width, brackets always contain the exact rank") {
    val bins = SparkEntry.queries("sketch_quantile_bins")(spark, dir).cache()
    // a few hundred rows whatever the input size, width = 10^p per bin
    assert(bins.count() < 1000)
    assert(bins.filter(col("hi_cents") - col("lo_cents") > col("lo_cents") / 10).count() == 0)
    bins.unpersist()
    val est = SparkEntry.queries("sketch_quantile_est")(spark, dir)
    assert(est.count() == 3)
    assert(est.filter(!col("contained")).count() == 0)
  }

  test("bloom decontamination has NO false negatives and a fixed-size broadcastable filter") {
    val out = SparkEntry.queries("q_decontaminate_bloom")(spark, dir).cache()
    // soundness: every exactly-contaminated fingerprint must be flagged
    assert(out.filter(!col("sound")).count() == 0)
    assert(out.filter(col("n_bloom") < col("n_exact")).count() == 0)
    // every doc the exact intersection flags appears in the bloom output
    val exactDocs = SparkEntry.queries("q_decontaminate")(spark, dir)
      .select(col("doc_id")).distinct()
    assert(exactDocs.join(out, Seq("doc_id"), "left_anti").count() == 0,
      "bloom missed an exactly-contaminated doc")
    out.unpersist()
    val bits = SparkEntry.queries("sketch_bloom_bits")(spark, dir)
    assert(bits.count() <= graft.operators.Curation.BloomM / 32)
  }

  test("bloom filter merges: bits(full) == per-word bit_or of disjoint halves") {
    import graft.operators.Curation
    val fps = Curation.bloomTestFps(spark, dir).cache()
    val full = Curation.bloomBitsOf(fps)
    val merged = Curation.bloomBitsOf(fps.filter(col("fp") % 2 === 0))
      .unionByName(Curation.bloomBitsOf(fps.filter(col("fp") % 2 === 1)))
      .groupBy("block").agg(expr("bit_or(word)").as("word"))
    assert(full.exceptAll(merged).isEmpty && merged.exceptAll(full).isEmpty)
    fps.unpersist()
  }

  test("stratified sample is a shuffle-free deterministic filter with per-stratum rates") {
    val out = SparkEntry.queries("q_stratified_sample")(spark, dir)
    val p   = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"stateless sample introduced a shuffle:\n${p.take(2000)}")
    // rates are 10-40% by construction; global count must land inside
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val n     = out.count()
    assert(n > total / 20 && n < total * 45 / 100, s"sampled $n of $total")
  }

  test("hll intersect: union sketch is monotone and inclusion-exclusion tracks the exact overlap") {
    val rows = SparkEntry.queries("sketch_hll_intersect")(spark, dir).collect()
    val nTypes = spark.read.parquet(s"$dir/events.parquet")
      .select("event_type").distinct().count()
    assert(rows.length == (nTypes * (nTypes - 1) / 2).toInt)
    rows.foreach { r =>
      val (a, b, u) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
        r.getAs[Double]("est_union"))
      val est   = r.getAs[Double]("est_intersect")
      val exact = r.getAs[Long]("exact_intersect")
      // register-max merge: union dominates both sides and stays near-
      // subadditive (LC estimates are not STRICTLY subadditive — two
      // same-size sets can union to a hair over their sum, so the upper
      // check carries a small estimator slack)
      assert(u >= math.max(a, b) - 1e-9 && u <= a + b + 0.02 * u + 1.0)
      // with the LC small-range switch each estimate is within a few
      // percent here; inclusion-exclusion compounds three of them —
      // accept 10% of the union plus a small absolute floor
      assert(math.abs(est - exact) <= 0.10 * u + 10.0,
        s"pair ${r.getString(0)}/${r.getString(1)}: est $est vs exact $exact (union $u)")
    }
  }
}
