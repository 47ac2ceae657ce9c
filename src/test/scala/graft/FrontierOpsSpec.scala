package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the frontier-planning / index-economics family
  * (FrontierOps) over sf0.001. The exact cross-engine value check is the
  * driver's DuckDB oracle compare; here we pin the invariants a correct
  * implementation must satisfy independent of the second engine.
  */
class FrontierOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("crawl schedule: politeness gaps exact, queues dense, priority order") {
    val out = SparkEntry.queries("q_crawl_schedule")(spark, dir).cache()
    val n   = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.count() == n) // one slot per pending fetch
    // fetch_ms is exactly (queue_pos-1) * the host's declared delay, so
    // consecutive queue positions on one host are >= 500ms apart
    val viol = out.filter(
      col("fetch_ms") =!= (col("queue_pos") - 1) *
        (lit(500L) + substring(col("host"), 4, 6).cast("long") % 4 * 250L))
    assert(viol.count() == 0)
    // queue positions are dense 1..k per host
    val dense = out.groupBy(col("host"))
      .agg(count(lit(1)).as("k"), max(col("queue_pos")).as("mx"),
        min(col("queue_pos")).as("mn"))
      .filter(col("mx") =!= col("k") || col("mn") =!= 1)
    assert(dense.count() == 0)
    // within a host, earlier slots never carry lower priority
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("queue_pos"))
    val mono = out.withColumn("nxt", lead(col("priority"), 1).over(w))
      .filter(col("nxt").isNotNull && col("priority") < col("nxt"))
    assert(mono.count() == 0)
    out.unpersist(); ()
  }

  test("co-citation: ppm bounded, shared <= min set size, symmetric-free") {
    val out = SparkEntry.queries("q_link_cocitation")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("jaccard_ppm") < 0 || col("jaccard_ppm") > 1000000).count() == 0)
    assert(out.filter(col("shared") > least(col("na"), col("nb"))).count() == 0)
    // pairs are emitted once, ordered host_a < host_b
    assert(out.filter(col("host_a") >= col("host_b")).count() == 0)
    out.unpersist(); ()
  }

  test("frontier BFS: seed at depth 0, layers disjoint, edges respected") {
    val out = SparkEntry.queries("q_frontier_bfs")(spark, dir).cache()
    assert(out.filter(col("host") === "src0").head().getAs[Long]("depth") == 0L)
    // min-depth per host: no host in two layers
    assert(out.groupBy(col("host")).count().filter(col("count") > 1).count() == 0)
    // every 3rd doc links to the hub and the hub rotates outward, so the
    // 20-host sf graph is reached within the 2 unrolled layers
    assert(out.count() >= 3)
    assert(out.filter(col("depth") < 0 || col("depth") > 2).count() == 0)
    out.unpersist(); ()
  }

  test("gamma bits: encodings internally consistent per term") {
    val out = SparkEntry.queries("search_gamma_bits")(spark, dir).cache()
    assert(out.count() > 0)
    // gamma of v>=1 costs >=1 bit, varint >=1 byte; both beat nothing
    assert(out.filter(col("gamma_bits") < col("n_postings")).count() == 0)
    assert(out.filter(col("varint_bytes") < col("n_postings")).count() == 0)
    // a varint byte carries 7 payload bits vs gamma's ~2x log2 v, so
    // 8*varint_bytes can't be smaller than gamma_bits/2 in integer space
    assert(out.filter(col("varint_bytes") * 16 < col("gamma_bits")).count() == 0)
    // fixed-width is 64 bits per posting by construction
    assert(out.filter(col("fixed64_bits") =!= col("n_postings") * 64).count() == 0)
    out.unpersist(); ()
  }

  test("recrawl schedule: intervals span daily..~86s, bounded by change rate") {
    val out = SparkEntry.queries("q_recrawl_schedule")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("change_ppm") < 0 || col("change_ppm") > 1000000).count() == 0)
    assert(out.filter(col("nchanged") > col("nobs") - 1).count() == 0)
    // interval = next - last in [86400e6/1001, 86400e6/1] microseconds
    val iv = out.select((col("next_fetch_us") - col("last_us")).as("iv"))
    assert(iv.filter(col("iv") > 86400000000L || col("iv") < 86313686L).count() == 0)
    // a never-changing url waits the full day
    assert(out.filter(col("change_ppm") === 0 &&
      col("next_fetch_us") - col("last_us") =!= 86400000000L).count() == 0)
    out.unpersist(); ()
  }

  test("crawl budget: allocations sum exactly to the budget, quota error < 1 seat") {
    val out = SparkEntry.queries("q_crawl_budget")(spark, dir).cache()
    assert(out.agg(sum(col("alloc"))).head().getLong(0) == 1000L)
    // largest-remainder never strays more than 1 from the floor quota
    assert(out.filter(col("alloc") < col("floor_k") ||
      col("alloc") > col("floor_k") + 1).count() == 0)
    // seats beyond floor go to the largest remainders first
    val gotExtra = out.filter(col("alloc") === col("floor_k") + 1)
      .agg(max(col("rk"))).head().getLong(0)
    val noExtra = out.filter(col("alloc") === col("floor_k"))
      .agg(min(col("rk"))).head().getLong(0)
    assert(gotExtra < noExtra)
    out.unpersist(); ()
  }

  test("dedup_eval_pr: planted recall is total, counts consistent") {
    val r = SparkEntry.queries("dedup_eval_pr")(spark, dir).head()
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    assert(r.getAs[Long]("fn") == 0L)
    assert(r.getAs[Long]("n_predicted") ==
      r.getAs[Long]("tp") + r.getAs[Long]("extra"))
  }

  test("vocab coverage: ranks are powers of two, coverage monotone to ~1M ppm") {
    val out = SparkEntry.queries("q_vocab_coverage")(spark, dir)
      .orderBy(col("rank")).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => { val k = r.getAs[Long]("rank"); (k & (k - 1)) == 0 }))
    val ppm = rows.map(_.getAs[Long]("coverage_ppm"))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => a <= b })
    assert(ppm.forall(p => p > 0 && p <= 1000000))
    val cum = rows.map(_.getAs[Long]("cum_cf"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b })
    out.unpersist(); ()
  }

  /** Undirected host edge set re-derived in plain Scala from the
    * documented link rotation — the independent second opinion shared by
    * the graph-kernel tests. */
  private def bruteEdges(): Set[(String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map { r =>
        val (id, src) = (r.getAs[Long]("doc_id"), r.getAs[String]("source"))
        val idx = src.drop(3).toInt
        val dst =
          if (id % 3 == 0 && src != "src0") "src0"
          else s"src${(idx + 1 + (id % 19).toInt) % 20}"
        (src, dst)
      }
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet

  test("q_triangle_count matches a brute-force enumeration of the host graph") {
    val out = SparkEntry.queries("q_triangle_count")(spark, dir).collect()
      .map(r => r.getAs[String]("host") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_triangles")))).toMap
    // naive O(V^3) over the tiny host graph
    val edges = bruteEdges()
    val hosts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def adj(a: String, b: String) =
      edges.contains(if (a < b) (a, b) else (b, a))
    val triPerHost = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for {
      i <- hosts.indices; j <- (i + 1) until hosts.size; k <- (j + 1) until hosts.size
      if adj(hosts(i), hosts(j)) && adj(hosts(i), hosts(k)) && adj(hosts(j), hosts(k))
    } Seq(hosts(i), hosts(j), hosts(k)).foreach(h => triPerHost(h) += 1)
    hosts.foreach { h =>
      val degWant = edges.count(e => e._1 == h || e._2 == h).toLong
      assert(out(h) == ((degWant, triPerHost(h))), s"host $h: got ${out(h)}")
    }
  }

  test("q_link_prediction equals brute-force resource allocation over non-edges") {
    val out = SparkEntry.queries("q_link_prediction")(spark, dir).collect()
      .map(r => (r.getAs[String]("host_a"), r.getAs[String]("host_b")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Long]("ra_ppm")))).toMap
    val edges = bruteEdges()
    val hosts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def nbrs(h: String) =
      edges.collect { case (a, b) if a == h => b; case (a, b) if b == h => a }
    val want = (for {
      i <- hosts.indices; j <- (i + 1) until hosts.size
      x = hosts(i); y = hosts(j)
      if !edges.contains((x, y))
      common = nbrs(x).intersect(nbrs(y))
      if common.nonEmpty
    } yield (x, y) -> ((common.size.toLong,
      common.toSeq.map(z => 1000000L / nbrs(z).size).sum))).toMap
    assert(out == want, s"diff: ${(out.toSet -- want.toSet) ++ (want.toSet -- out.toSet)}")
  }

  test("q_hyperball: register counts match HLL sketches of brute-force reachable sets") {
    val out = SparkEntry.queries("q_hyperball")(spark, dir).collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Long]("radius")) ->
        ((r.getAs[Long]("m_hit"), r.getAs[Long]("v_zero"), r.getAs[Double]("estimate")))).toMap
    // DIRECTED edges — hostEdges keeps direction; bruteEdges() canonicalizes
    // to undirected pairs (triangle counting), which is the wrong graph here.
    val edges = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map { r =>
        val (id, src) = (r.getAs[Long]("doc_id"), r.getAs[String]("source"))
        val idx = src.drop(3).toInt
        val dst =
          if (id % 3 == 0 && src != "src0") "src0"
          else s"src${(idx + 1 + (id % 19).toInt) % 20}"
        (src, dst)
      }.filter { case (a, b) => a != b }.toSet
    val hosts = edges.flatMap(e => Seq(e._1, e._2))
    def outN(h: String): Set[String] = edges.collect { case (a, b) if a == h => b }
    // brute reachable balls by radius
    def ball(r: Int): Map[String, Set[String]] =
      hosts.map { h =>
        var s = Set(h)
        (0 until r).foreach(_ => s = s ++ s.flatMap(outN))
        h -> s
      }.toMap
    // driver HLL: hex32("hb:" + x) → (reg, rho), count distinct registers
    def hex32d(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def mHit(members: Set[String]): Long =
      members.map(x => hex32d("hb:" + x) % 512).size.toLong
    assert(out.size == hosts.size * 3, s"expected ${hosts.size}×3 rows, got ${out.size}")
    (0 to 2).foreach { r =>
      val balls = ball(r)
      hosts.foreach { h =>
        val (m, v, _) = out((h, r.toLong))
        assert(m == mHit(balls(h)), s"host $h radius $r m_hit")
        assert(v == 512L - m, s"host $h radius $r v_zero")
      }
    }
    // ball growth is monotone in the estimate (max-merge can only add)
    hosts.foreach { h =>
      val e = (0 to 2).map(r => out((h, r.toLong))._3)
      assert(e(0) <= e(1) + 1e-9 && e(1) <= e(2) + 1e-9, s"host $h estimates $e not monotone")
      assert(e(0) > 0.9 && e(0) < 1.1, s"host $h radius-0 estimate ${e(0)} not ≈1")
    }
    // the graph actually expands: some ball grows between r1 and r2
    assert(hosts.exists(h => out((h, 2L))._1 > out((h, 1L))._1),
      "no ball grew from radius 1 to 2 — plant degenerate")
  }

  test("q_effective_diameter aggregates the hyperball estimates exactly") {
    val hb = SparkEntry.queries("q_hyperball")(spark, dir).collect()
      .map(r => (r.getAs[Long]("radius"), r.getAs[Double]("estimate")))
    val nf = hb.groupBy(_._1).view
      .mapValues(_.map(x => math.round(x._2 * 10000)).sum).toMap
    val radii = nf.keys.toSeq.sorted
    val deltas = radii.map(r => r -> (nf(r) - nf.getOrElse(r - 1, 0L))).toMap
    val nmax = nf(radii.last)
    val thr = 9 * nmax / 10
    val avg = radii.map(r => r * deltas(r)).sum * 1000000L / nmax
    val rEff = radii.find(nf(_) >= thr).get
    val eff =
      if (rEff == 0L) 0L
      else (rEff - 1) * 1000000L +
        (thr - (nf(rEff) - deltas(rEff))) * 1000000L / deltas(rEff)
    val out = SparkEntry.queries("q_effective_diameter")(spark, dir).collect()
    assert(out.length == radii.length)
    out.foreach { r =>
      val rad = r.getAs[Long]("radius")
      assert(r.getAs[Long]("nf_e4") == nf(rad), s"nf_e4 at $rad")
      assert(r.getAs[Long]("delta_e4") == deltas(rad), s"delta_e4 at $rad")
      assert(r.getAs[Long]("frac_ppm") == nf(rad) * 1000000L / nmax, s"frac at $rad")
      assert(r.getAs[Long]("avg_dist_ppm") == avg, s"avg at $rad")
      assert(r.getAs[Long]("eff_diam_ppm") == eff, s"eff at $rad")
    }
    // the planted graph reaches 90% coverage strictly inside the 2 rounds
    assert(eff > 0L && eff <= 2000000L, s"eff_diam_ppm $eff out of band")
  }

  test("q_kcore_peel equals a brute-force two-round peel of the page graph") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val p = math.max(2L, rows.length / 100L)
    val und = rows.flatMap { case (id, src) =>
      val idx = src.drop(3).toInt
      val dstHost =
        if (id % 3 == 0 && src != "src0") "src0"
        else s"src${(idx + 1 + (id % 19).toInt) % 20}"
      val (a, b) = (s"$src/${id % p}", s"$dstHost/${(id * 7 + 3) % p}")
      if (a == b) None else Some(if (a < b) (a, b) else (b, a))
    }.toSet
    def degOf(ed: Set[(String, String)]): Map[String, Long] =
      ed.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (h, xs) => h -> xs.size.toLong }
    val d0 = degOf(und)
    val rm1 = d0.filter(_._2 < 5).keySet
    val e1 = und.filter { case (a, b) => !rm1(a) && !rm1(b) }
    val d1 = degOf(e1)
    val rm2 = d0.keySet.filterNot(rm1).filter(h => d1.getOrElse(h, 0L) < 5)
    val e2 = e1.filter { case (a, b) => !rm2(a) && !rm2(b) }
    val d2 = degOf(e2)
    val want = d0.map { case (h, dg0) =>
      val rr = if (dg0 < 5) 1L else if (d1.getOrElse(h, 0L) < 5) 2L else 0L
      h -> ((dg0, d1.getOrElse(h, 0L), d2.getOrElse(h, 0L), rr))
    }
    val out = SparkEntry.queries("q_kcore_peel")(spark, dir).collect()
      .map(r => r.getAs[String]("page") -> ((r.getAs[Long]("deg0"),
        r.getAs[Long]("deg1"), r.getAs[Long]("deg2"),
        r.getAs[Long]("removed_round")))).toMap
    assert(out == want,
      s"diff: ${(out.keySet -- want.keySet) ++ (want.keySet -- out.keySet)}")
    // the plant is non-vacuous: both peel rounds remove pages, a core survives
    assert(rm1.nonEmpty && rm2.nonEmpty, s"peel rounds (${rm1.size}, ${rm2.size})")
    assert(want.values.exists(_._4 == 0L), "no page survived the two peels")
  }

  test("q_conductance equals a brute-force cut count over the peeled core") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val p = math.max(2L, rows.length / 100L)
    val und = rows.flatMap { case (id, src) =>
      val idx = src.drop(3).toInt
      val dstHost =
        if (id % 3 == 0 && src != "src0") "src0"
        else s"src${(idx + 1 + (id % 19).toInt) % 20}"
      val (a, b) = (s"$src/${id % p}", s"$dstHost/${(id * 7 + 3) % p}")
      if (a == b) None else Some(if (a < b) (a, b) else (b, a))
    }.toSet
    def degOf(ed: Set[(String, String)]): Map[String, Long] =
      ed.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (h, xs) => h -> xs.size.toLong }
    val rm1 = degOf(und).filter(_._2 < 5).keySet
    val e1 = und.filter { case (a, b) => !rm1(a) && !rm1(b) }
    val rm2 = degOf(e1).filter(_._2 < 5).keySet
    val e2 = e1.filter { case (a, b) => !rm2(a) && !rm2(b) }
    val core = e2.flatMap(e => Seq(e._1, e._2))
    val nEdges = und.size.toLong
    val edgesIn = und.count { case (a, b) => core(a) && core(b) }.toLong
    val cut = und.count { case (a, b) => core(a) ^ core(b) }.toLong
    val volCore = 2 * edgesIn + cut
    val volRest = 2 * (nEdges - edgesIn - cut) + cut
    val phi = if (math.min(volCore, volRest) == 0) 0L
      else cut * 1000000L / math.min(volCore, volRest)
    val out = SparkEntry.queries("q_conductance")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_core") == core.size.toLong)
    assert(r.getAs[Long]("n_edges") == nEdges && r.getAs[Long]("edges_in") == edgesIn)
    assert(r.getAs[Long]("cut") == cut)
    assert(r.getAs[Long]("vol_core") == volCore && r.getAs[Long]("vol_rest") == volRest)
    assert(r.getAs[Long]("phi_ppm") == phi, s"phi ${r.getAs[Long]("phi_ppm")} != $phi")
    // non-vacuous at this sf: a core exists and it is not the whole graph
    assert(core.nonEmpty && cut > 0, s"core ${core.size}, cut $cut")
  }

  test("q_assortativity equals a brute-force exact Pearson over the page graph") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val p = math.max(2L, rows.length / 100L)
    val und = rows.flatMap { case (id, src) =>
      val idx = src.drop(3).toInt
      val dstHost =
        if (id % 3 == 0 && src != "src0") "src0"
        else s"src${(idx + 1 + (id % 19).toInt) % 20}"
      val (a, b) = (s"$src/${id % p}", s"$dstHost/${(id * 7 + 3) % p}")
      if (a == b) None else Some(if (a < b) (a, b) else (b, a))
    }.toSet
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (h, xs) => h -> xs.size.toLong }
    val pairs = und.toSeq.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val m2  = pairs.size.toLong
    val sxy = pairs.map { case (x, y) => x * y }.sum
    val sx  = pairs.map(_._1).sum
    val sx2 = pairs.map(x => x._1 * x._1).sum
    val num = m2 * sxy - sx * sx
    val den = m2 * sx2 - sx * sx
    val rPpm = BigInt(num * 1000000L).mod(BigInt(den)) match {
      case r => (BigInt(num) * 1000000 - r) / den
    }
    val out = SparkEntry.queries("q_assortativity")(spark, dir).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Long]("m2") == m2 && row.getAs[Long]("sxy") == sxy)
    assert(row.getAs[Long]("sx") == sx && row.getAs[Long]("sx2") == sx2)
    assert(row.getAs[Long]("num") == num && row.getAs[Long]("den") == den)
    assert(row.getAs[Long]("r_ppm") == rPpm.toLong,
      s"r_ppm ${row.getAs[Long]("r_ppm")} != $rPpm")
    // r is a correlation: strictly inside [-1, 1] scaled, and the page
    // graph is not degree-random (|r| > 0)
    assert(math.abs(rPpm.toLong) <= 1000000L && rPpm.toLong != 0L,
      s"degenerate r_ppm $rPpm")
  }

  test("q_label_prop equals a brute-force two-round majority propagation") {
    val out = SparkEntry.queries("q_label_prop")(spark, dir).collect()
      .map(r => r.getAs[String]("host") ->
        ((r.getAs[Long]("label"), r.getAs[Long]("round_assigned")))).toMap
    val edges = bruteEdges()
    val hosts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def nbrs(h: String) =
      edges.collect { case (a, b) if a == h => b; case (a, b) if b == h => a }
    var labels: Map[String, (Long, Long)] = hosts
      .filter(_.drop(3).toInt < 4)
      .map(h => h -> ((h.drop(3).toLong, 0L))).toMap
    (1 to 2).foreach { round =>
      val newly = hosts.filterNot(labels.contains).flatMap { h =>
        val votes = nbrs(h).toSeq.flatMap(n => labels.get(n).map(_._1))
        if (votes.isEmpty) None
        else {
          val win = votes.groupBy(identity).toSeq
            .map { case (l, v) => (l, v.size) }
            .minBy { case (l, c) => (-c, l) }._1
          Some(h -> ((win, round.toLong)))
        }
      }
      labels = labels ++ newly // simultaneous update: newly never re-reads itself
    }
    assert(out.keySet == hosts.toSet)
    hosts.foreach { h =>
      assert(out(h) == labels.getOrElse(h, (-1L, -1L)), s"host $h: got ${out(h)}")
    }
    // both propagation rounds genuinely fire on this graph
    assert(out.values.count(_._2 == 1L) > 0 || labels.size == hosts.size)
    assert(labels.size > 4, "no propagation happened at all")
  }
}
