package graft.operators

import graft.functions.TextKernels.{hex32, tokens, Dk}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier planning and index-economics operators — the scheduling
  * and accounting layer that sits between the crawl-permission/link-graph
  * ops in [[WebOps]] and the search-index build (`search_postings`):
  * politeness-constrained fetch scheduling, link-graph host similarity
  * (bibliographic coupling), seed-set frontier expansion (BFS layers),
  * change-rate-driven recrawl scheduling, global crawl-budget
  * apportionment (largest remainder), compressed posting-list size
  * accounting (Elias-gamma / varint vs fixed-width), and
  * tokenizer-vocabulary coverage curves.
  *
  * Scale design notes:
  *  - the scheduler windows per host — the politeness constraint IS a
  *    per-host total order, so `Window.partitionBy(host)` is the minimal
  *    shuffle (one pass, keyed by the ~|hosts| queue key, never a global
  *    sort of the URL set); per-host queue depth bounds task memory and a
  *    mega-host is exactly the skew the existing salting toolkit caps;
  *  - co-citation joins hosts on shared outlink TARGETS: pair rows exist
  *    only for targets that co-occur, the join key is a host string
  *    (≪ text), and per-target fanout is the target's in-degree — the
  *    hub-cap discipline of `q_mirror_hosts` applies unchanged;
  *  - BFS ships (src, dst) host pairs only; each layer is one equi-join of
  *    the current frontier (tiny — hosts, not docs) against the edge set,
  *    with a broadcast-able frontier and an anti-join on the visited set.
  *    Two layers are unrolled here (the sf graph's diameter); production
  *    loops until the frontier empties, same join per round;
  *  - gamma/varint accounting reduces the posting stream to per-term
  *    integer sums as it's generated — no encoded bytes materialize, the
  *    shuffle carries (term, 3 longs); `length(bin(v))-1` is ⌊log2 v⌋ in
  *    pure integer space on both engines (no float log surface);
  *  - vocabulary coverage sorts the VOCAB (≪ corpus) once; the corpus-side
  *    work is the same map-side-combined (term → cf) aggregation every
  *    text op here uses. The powers-of-two report keeps output O(log V).
  */
object FrontierOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** q_random_walks: hops per walk; q_walk_skipgrams: context radius. */
  private val RwLen = 4
  private val SkipW = 2

  /** Oracle twin of the walk hops (w0..w[RwLen] CTEs over an `e` edge
    * CTE the caller opens) — shared by the q_random_walks and
    * q_walk_skipgrams oracles so the hash-hop rule cannot drift. */
  private lazy val dkWalkHops: String = {
    val hops = (1 to RwLen).map { t =>
      s"""w$t AS MATERIALIZED (
         |  SELECT walk, dst AS node FROM (
         |    SELECT w.walk, e.dst, row_number() OVER (PARTITION BY w.walk
         |      ORDER BY ${Dk.hex32(s"w.node || '|$t|' || e.dst")}, e.dst) AS rn
         |    FROM w${t - 1} w JOIN e ON e.src = w.node) WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""w0 AS (SELECT DISTINCT src AS walk, src AS node FROM e),
       |$hops""".stripMargin
  }

  /** The (walk, node, step) trace union over [[dkWalkHops]]'s CTEs. */
  private lazy val dkWalkTrace: String =
    (0 to RwLen).map { t =>
      s"SELECT walk, node, $t::BIGINT AS step FROM w$t"
    }.mkString("\nUNION ALL ")

  /** Label-propagation CTE chain (`und` through `l2`, over an `e` edge
    * CTE the caller opens) + the final labeling select — shared by the
    * q_label_prop and q_graph_modularity oracles. */
  private lazy val dkLabelPropCtes: String =
    s"""und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
       |nb AS (SELECT a AS h, b AS n FROM und UNION ALL SELECT b AS h, a AS n FROM und),
       |hosts AS (SELECT DISTINCT h FROM nb),
       |seeds AS (
       |  SELECT h, CAST(substr(h, 4) AS BIGINT) AS label, 0::BIGINT AS round_assigned
       |  FROM hosts WHERE CAST(substr(h, 4) AS INT) < $LabelSeeds),
       |w1 AS (
       |  SELECT nb.h, s.label, count(*) AS votes
       |  FROM nb JOIN seeds s ON s.h = nb.n
       |  WHERE nb.h NOT IN (SELECT h FROM seeds)
       |  GROUP BY 1, 2),
       |r1 AS (
       |  SELECT h, label, 1::BIGINT AS round_assigned FROM (
       |    SELECT h, label,
       |      row_number() OVER (PARTITION BY h ORDER BY votes DESC, label) AS rn
       |    FROM w1) WHERE rn = 1),
       |l1 AS (SELECT * FROM seeds UNION ALL SELECT * FROM r1),
       |w2 AS (
       |  SELECT nb.h, s.label, count(*) AS votes
       |  FROM nb JOIN l1 s ON s.h = nb.n
       |  WHERE nb.h NOT IN (SELECT h FROM l1)
       |  GROUP BY 1, 2),
       |r2 AS (
       |  SELECT h, label, 2::BIGINT AS round_assigned FROM (
       |    SELECT h, label,
       |      row_number() OVER (PARTITION BY h ORDER BY votes DESC, label) AS rn
       |    FROM w2) WHERE rn = 1),
       |l2 AS (SELECT * FROM l1 UNION ALL SELECT * FROM r2)""".stripMargin

  private lazy val dkLabelPropSelect: String =
    """SELECT hosts.h AS host,
      |  coalesce(l2.label, -1)::BIGINT AS label,
      |  coalesce(l2.round_assigned, -1)::BIGINT AS round_assigned
      |FROM hosts LEFT JOIN l2 ON l2.h = hosts.h""".stripMargin

  /** Per-host politeness delay (ms): hosts declare different crawl-delays
    * (robots Crawl-delay analog) — 500ms base, +250ms per (idx mod 4). */
  private def delayMs(hostIdx: org.apache.spark.sql.Column) =
    lit(500L) + (hostIdx % 4).cast("long") * 250L

  /** Distinct host→host edge set from the shared [[WebOps.linkTarget]]
    * rotation (self-loops dropped — a host linking itself schedules
    * nothing new). */
  private def hostEdges(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("source").as("src"), WebOps.linkTarget.as("dst"))
      .filter(col("src") =!= col("dst")).distinct()

  private val dkHostEdges =
    s"""SELECT DISTINCT source AS src, ${WebOps.dkLinkTarget} AS dst
       |  FROM documents WHERE source <> ${WebOps.dkLinkTarget}""".stripMargin

  /** Oracle twin of [[hyperballEstimates]]: the r0/r1/r2 register CTEs
    * plus `ests` = per-(host, radius) corrected estimates. Shared by the
    * q_hyperball and q_effective_diameter oracles so the sketch math
    * cannot drift between them. */
  private lazy val dkHyperballCtes: String = {
    import Sketches.{M, WBits}
    val est = (src: String, radius: Int) =>
      s"""SELECT host, $radius::BIGINT AS radius, m_hit::BIGINT AS m_hit,
         |    ($M - m_hit)::BIGINT AS v_zero,
         |    CASE WHEN ($M - m_hit) > 0 AND raw_estimate <= ${2.5 * M}
         |      THEN round(${M.toDouble} * ln(${M.toDouble} / ($M - m_hit)), 4)
         |      ELSE raw_estimate END AS estimate
         |  FROM (
         |    SELECT host, count(*) AS m_hit,
         |      round((0.7213 / (1.0 + 1.079 / ${M.toDouble})) * ${M.toDouble} * ${M.toDouble}
         |        / (((sum((2.0 ^ (${WBits + 1} - rho))::BIGINT)
         |             + ($M - count(*)) * ${1L << (WBits + 1)})::DOUBLE)
         |           / ${(1L << (WBits + 1)).toDouble}), 4) AS raw_estimate
         |    FROM $src GROUP BY 1)""".stripMargin
    s"""e AS ($dkHostEdges),
       |hosts AS (SELECT DISTINCT host FROM (
       |  SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),
       |r0 AS (
       |  SELECT host, hh % $M AS reg,
       |    CASE WHEN hh // $M = 0 THEN ${WBits + 1}
       |         ELSE ${WBits + 1} - length(to_base(hh // $M, 2)) END AS rho
       |  FROM (SELECT host, ${Dk.hex32("'hb:' || host")} AS hh FROM hosts)),
       |r1 AS (
       |  SELECT host, reg, max(rho) AS rho FROM (
       |    SELECT * FROM r0
       |    UNION ALL
       |    SELECT e.src AS host, r.reg, r.rho FROM e JOIN r0 r ON r.host = e.dst)
       |  GROUP BY 1, 2),
       |r2 AS (
       |  SELECT host, reg, max(rho) AS rho FROM (
       |    SELECT * FROM r1
       |    UNION ALL
       |    SELECT e.src AS host, r.reg, r.rho FROM e JOIN r1 r ON r.host = e.dst)
       |  GROUP BY 1, 2),
       |ests AS (
       |${est("r0", 0)}
       |UNION ALL
       |${est("r1", 1)}
       |UNION ALL
       |${est("r2", 2)})""".stripMargin
  }

  /** The two-round peel CTE chain over [[dkPageEdges]] (q_kcore_peel and
    * q_conductance share it). */
  private lazy val dkPeelCtes: String =
    s"""$dkPageEdges,
       |d0 AS (SELECT page, count(*)::BIGINT AS deg0 FROM (
       |    SELECT a AS page FROM pund UNION ALL SELECT b FROM pund) GROUP BY 1),
       |e0 AS (SELECT a, b FROM pund),
       |e1 AS (SELECT * FROM e0
       |  WHERE a NOT IN (SELECT page FROM d0 WHERE deg0 < $KCoreK)
       |    AND b NOT IN (SELECT page FROM d0 WHERE deg0 < $KCoreK)),
       |d1 AS (SELECT page, count(*)::BIGINT AS deg1 FROM (
       |    SELECT a AS page FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
       |e2 AS (SELECT * FROM e1
       |  WHERE a NOT IN (SELECT page FROM d1 WHERE deg1 < $KCoreK)
       |    AND b NOT IN (SELECT page FROM d1 WHERE deg1 < $KCoreK)),
       |d2 AS (SELECT page, count(*)::BIGINT AS deg2 FROM (
       |    SELECT a AS page FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1)""".stripMargin

  /** Shared HyperBall rounds (q_hyperball rows, q_effective_diameter
    * input): per (host, radius ∈ 0..2), the corrected-HLL estimate of the
    * directed radius-r reachable set. See the q_hyperball comment for the
    * algorithm; this is the Spark twin of the r0/r1/r2 oracle CTEs. */
  private def hyperballEstimates(s: SparkSession, dir: String): DataFrame = {
    import Sketches.{M, WBits}
    val e = hostEdges(s, dir)
    val hosts = e.select(col("src").as("host"))
      .unionByName(e.select(col("dst").as("host"))).distinct()
    val r0 = hosts
      .withColumn("h", hex32(concat(lit("hb:"), col("host"))))
      .select(col("host"), (col("h") % M).as("reg"), expr(s"h DIV $M").as("w"))
      .withColumn("rho", when(col("w") === 0, lit(WBits + 1).cast("long"))
        .otherwise(lit(WBits + 1) - length(conv(col("w").cast("string"), 10, 2)))
        .cast("long"))
      .select(col("host"), col("reg"), col("rho"))
    def ball(regs: DataFrame): DataFrame =
      regs.unionByName(
          e.join(regs.withColumnRenamed("host", "nb"), col("dst") === col("nb"))
            .select(col("src").as("host"), col("reg"), col("rho")))
        .groupBy(col("host"), col("reg")).agg(max(col("rho")).as("rho"))
    val r1 = ball(r0)
    val r2 = ball(r1)
    Seq((r0, 0L), (r1, 1L), (r2, 2L)).map { case (regs, r) =>
      Sketches.estimateCorrected(regs, Seq("host"))
        .select(col("host"), lit(r).as("radius"), col("m_hit"),
          col("v_zero"), col("estimate"))
    }.reduce(_ unionByName _)
  }

  /** q_link_prediction / q_link_cocitation: deterministic per-common-key
    * fanout cap (smallest rows by name) — the hub-squaring guard. */
  private[graft] val MaxNeighbors = 256L

  /** Deterministic per-key fanout cap: keep the first `cap` rows per `key`
    * ordered by `ord` (row_number). Every pair-minting self-join in the
    * catalog routes through this discipline — a hot key (favicon.ico-class
    * link sink, replicated error-page hash) loudly stops minting at cap²
    * candidates instead of squaring its multiplicity. The cap choice is
    * deterministic (ORDER BY name, not arrival order) so Spark and the
    * DuckDB oracle agree row-for-row. */
  private[graft] def capPerKey(df: DataFrame, key: String, ord: String,
      cap: Long): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(ord))))
      .filter(col("rn") <= cap).drop("rn")

  /** q_label_prop: hosts src0..src{n-1} are the labeled seed set. */
  private val LabelSeeds = 4

  /** q_kcore_peel: coreness threshold (page-graph degrees < this peel). */
  private val KCoreK = 5L

  /** The derived PAGE graph (page = host/path-bucket, buckets ∝
    * corpus/100): undirected distinct edges. Sparse where the 20-host
    * graph saturates — the graph q_kcore_peel and q_assortativity run
    * on. */
  private def pageEdges(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val p = math.max(2L, d.count() / 100L)
    d.select(
        concat(col("source"), lit("/"), (col("doc_id") % p).cast("string")).as("src"),
        concat(WebOps.linkTarget, lit("/"),
          ((col("doc_id") * 7 + 3) % p).cast("string")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
  }

  /** [[pageEdges]]'s oracle twin: CTEs `np` (bucket count) and `pund`
    * (undirected page edges). */
  private val dkPageEdges =
    s"""np AS (SELECT greatest(2, count(*) // 100) AS p FROM documents),
       |praw AS (
       |  SELECT source || '/' || (doc_id % p)::VARCHAR AS src,
       |    (${WebOps.dkLinkTarget}) || '/' || ((doc_id * 7 + 3) % p)::VARCHAR AS dst
       |  FROM documents, np),
       |pund AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM praw WHERE src <> dst)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Politeness-constrained crawl scheduler: each doc is a pending fetch
    // on its source host; per host, urls are ordered by priority (higher
    // first, doc_id tiebreak) and assigned fetch_ms = queue_pos * host
    // crawl-delay. The output is the merged global timeline each fetcher
    // fleet consumes: (host, queue_pos, fetch_ms, minute bucket).
    "q_crawl_schedule" -> ((s, dir) => {
      val hostIdx = substring(col("source"), 4, 6).cast("int")
      val prio    = (col("doc_id") * 37L % 97L).as("priority")
      docs(s, dir).select(col("doc_id"), col("source").as("host"),
          hostIdx.as("h"), prio)
        .withColumn("queue_pos", row_number().over(
          Window.partitionBy(col("host")).orderBy(col("priority").desc, col("doc_id"))).cast("long"))
        .withColumn("fetch_ms", (col("queue_pos") - 1) * delayMs(col("h")))
        .select(col("doc_id"), col("host"), col("priority"), col("queue_pos"),
          col("fetch_ms"), expr("fetch_ms div 60000").as("minute"))
    }),

    // Triangle counting + local clustering coefficient on the host graph
    // — the canonical distributed graph kernel (Suri & Vassilvitskii's
    // MR triangle counting, via DEGREE-ORDERED ORIENTATION): symmetrize
    // the link graph, orient every edge from the (degree, name)-smaller
    // endpoint to the larger, and count closed wedges. Orientation is
    // what makes this survive scale-up: each triangle is counted exactly
    // once, and the wedge join fans out by the ORIENTED out-degree, which
    // the ordering bounds by O(sqrt(|E|)) even for celebrity hosts — the
    // unoriented join would square the hub's degree. Shuffles carry
    // (host, host) pairs only. Output per host: degree, triangle count,
    // clustering coefficient in ppm (integer-exact).
    "q_triangle_count" -> ((s, dir) => {
      val e = hostEdges(s, dir)
      val und = e.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
      val deg = und.select(col("a").as("h")).unionAll(und.select(col("b").as("h")))
        .groupBy(col("h")).agg(count(lit(1)).as("deg"))
      val withDeg = und
        .join(deg.select(col("h").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("h").as("b"), col("deg").as("db")), Seq("b"))
      val o = withDeg.select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("v"))
      val wedges = o.select(col("u"), col("v").as("x"))
        .join(o.select(col("u"), col("v").as("y")), Seq("u"))
        .filter(col("x") < col("y"))
      val tri = wedges.join(
        // both orientations of the closing edge (unionByName — positional
        // unionAll would silently un-swap the second leg)
        o.select(col("u").as("x"), col("v").as("y"))
          .unionByName(o.select(col("v").as("x"), col("u").as("y"))),
        Seq("x", "y"))
      val perHost = tri.select(col("u").as("h"))
        .unionAll(tri.select(col("x").as("h")))
        .unionAll(tri.select(col("y").as("h")))
        .groupBy(col("h")).agg(count(lit(1)).as("n_triangles"))
      deg.join(perHost, Seq("h"), "left_outer")
        .select(col("h").as("host"), col("deg"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
        .withColumn("clustering_ppm",
          when(col("deg") >= 2,
            expr("(2 * n_triangles * 1000000) DIV (deg * (deg - 1))")).otherwise(lit(0L)))
    }),

    // Link prediction by the resource-allocation index (Zhou, Lü & Zhang,
    // EPJ B 2009): for every NON-adjacent host pair, score = Σ_z 1e6 DIV
    // deg(z) over their common neighbors z — RA is Adamic–Adar with 1/deg
    // in place of 1/log·deg, which keeps the score integer-exact across
    // engines (no float log surface). The crawl use: predicted links are
    // hosts that SHOULD be related (shared low-degree neighbors weigh
    // most) — seed candidates for discovery crawling. Scale shape:
    // candidate pairs are minted THROUGH each common neighbor z (one
    // equi-join on z), so cost is Σ_z deg(z)², bounded by the same
    // deterministic per-key cap as the LSH band join (smallest
    // MaxNeighbors per z by name, row_number — mirrored in the oracle;
    // at scale a capped hub loudly stops minting candidates instead of
    // squaring). Shuffles carry host-string pairs only; the final
    // anti-join removes already-existing edges.
    "q_link_prediction" -> ((s, dir) => {
      val und = hostEdges(s, dir).select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
      val nb = und.select(col("a").as("z"), col("b").as("n"))
        .unionByName(und.select(col("b").as("z"), col("a").as("n")))
      val deg = nb.groupBy(col("z")).agg(count(lit(1)).as("deg"))
      val capped = capPerKey(nb, "z", "n", MaxNeighbors)
      val scored = capped.as("l").join(capped.as("r"),
          col("l.z") === col("r.z") && col("l.n") < col("r.n"))
        .select(col("l.z").as("z"), col("l.n").as("x"), col("r.n").as("y"))
        .join(deg, Seq("z"))
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("n_common"), sum(expr("1000000 DIV deg")).as("ra_ppm"))
      scored.join(und,
          scored("x") === und("a") && scored("y") === und("b"), "left_anti")
        .select(col("x").as("host_a"), col("y").as("host_b"),
          col("n_common"), col("ra_ppm"))
    }),

    // HyperBall neighborhood function (Boldi & Vigna 2013 — the algorithm
    // that measured Facebook's four degrees): per host, an HLL sketch of
    // the set of hosts reachable within radius r, grown by one SKETCH
    // MERGE per round — regs_{r+1}(h) = max-merge(regs_r(h), regs_r(n)
    // ∀ out-neighbors n). That merge is the whole trick: a round costs
    // one edges⋈registers equi-join + a (host, reg) max-aggregation of
    // (host, reg, rho) INTEGER triples — per-node state is M registers
    // whatever the ball size, so the memory that exact BFS frontiers
    // blow up (reachable sets ∝ nodes × ball) stays flat, which is why
    // this runs on billion-node graphs where exact neighborhood counting
    // cannot. Two rounds unrolled (production loops until the estimates
    // stop moving — the effective-diameter stop rule); estimates use the
    // catalog's corrected HLL estimator (linear counting engages at
    // these ball sizes; the branch condition and the one ln() follow the
    // hll_intersect 4dp cross-engine discipline). Radius-0 estimates
    // ≈ 1.0 are the visible sanity row.
    "q_hyperball" -> ((s, dir) => hyperballEstimates(s, dir)),

    // Neighborhood-function summary over the HyperBall rounds (Boldi &
    // Vigna 2013 §5 — the numbers HyperBall exists to produce): N(r) =
    // Σ_h |ball(h, r)| from the per-host HLL estimates, the per-radius
    // distance mass ΔN(r), the mean finite distance, and the q=0.9
    // effective diameter by the standard linear interpolation between
    // the bracketing radii. Cross-engine determinism: each 4dp per-host
    // estimate is converted to an int64 (×10⁴) BEFORE the corpus-wide
    // sum — float addition is order-dependent and a 10⁹-host sum WILL
    // disagree in the last ulp between engines/partitionings; integer
    // sums are exact and order-free. All downstream math (fractions,
    // mean, interpolation) is integer ppm floor-division. Headroom: ×10⁴
    // fixed-point overflows int64 once Σ estimates > 9.2e14 (ANSI sum
    // throws, loudly) — a 10⁹-host crawl drops to ×1 precision, same
    // plan. Scale shape:
    // the rounds are the hyperball joins; the summary collapses to ≤3
    // (radius, int64) rows map-side — nothing else shuffles.
    "q_effective_diameter" -> ((s, dir) => {
      // nf and q cached: both are ≤3-row (radius, int64) frames, but nf
      // feeds the delta window AND the threshold agg, and q feeds the
      // mean-distance agg, the interpolation agg AND the final select —
      // uncached, each reader re-derived the whole HyperBall round chain
      // (the q_conductance core discipline)
      val nf = hyperballEstimates(s, dir)
        .select(col("radius"), round(col("estimate") * 10000).cast("long").as("e4"))
        .groupBy(col("radius")).agg(sum(col("e4")).as("nf_e4"))
        .cache()
      val w = Window.orderBy(col("radius"))
      val d = nf
        .withColumn("delta_e4",
          col("nf_e4") - coalesce(lag(col("nf_e4"), 1).over(w), lit(0L)))
      val tot = nf.agg(max(struct(col("radius"), col("nf_e4"))).as("t"))
        .select(col("t.nf_e4").as("nf_max_e4"),
          expr("(9 * t.nf_e4) div 10").as("thr_e4"))
      val q = d.crossJoin(broadcast(tot)).cache()
      val avg = q.agg(sum(col("radius") * col("delta_e4")).as("mass"),
          max(col("nf_max_e4")).as("nmax"))
        .select(expr("(mass * 1000000) div nmax").as("avg_dist_ppm"))
      val eff = q.filter(col("nf_e4") >= col("thr_e4"))
        .agg(min(struct(col("radius"), col("nf_e4"), col("delta_e4"),
          col("thr_e4"))).as("s"))
        .select(expr(
          """case when s.radius = 0 then cast(0 as bigint)
            |else (s.radius - 1) * 1000000 +
            |  ((s.thr_e4 - (s.nf_e4 - s.delta_e4)) * 1000000) div s.delta_e4
            |end""".stripMargin).as("eff_diam_ppm"))
      q.select(col("radius"), col("nf_e4"), col("delta_e4"),
          expr("(nf_e4 * 1000000) div nf_max_e4").as("frac_ppm"))
        .crossJoin(broadcast(avg)).crossJoin(broadcast(eff))
    }),

    // k-core decomposition by iterative peeling (Batagelj–Zaveršnik made
    // distributed — the Matula/Beck peel as repeated degree-filter
    // rounds): remove every node with degree < k, recompute degrees on
    // the surviving subgraph, repeat; what survives is the k-core, the
    // density skeleton web-graph pipelines use for spam-farm detection
    // and crawl prioritization (link farms are dense cores; quality hubs
    // survive deep cores). Graph = the PAGE graph (page = host/path-
    // bucket, buckets ∝ corpus/100 so node count grows with data and
    // the structure stays sparse where the 20-host graph saturates);
    // two peel rounds unrolled (the catalog's iterative-op discipline —
    // production loops until no removals, O(max-coreness) rounds).
    // Output per page: degree trajectory and removed_round (1, 2, or 0 =
    // still in the running core after two peels). Scale shape: a round
    // is ONE degree aggregation (map-side combined) + two anti-joins
    // keyed on page ids — shuffles carry (page, int64) only, the CC/
    // label-prop discipline; removal sets stay id-frames, never
    // collected.
    "q_kcore_peel" -> ((s, dir) => {
      val und = pageEdges(s, dir)
      def degOf(ed: DataFrame, name: String): DataFrame =
        ed.select(col("a").as("page")).unionAll(ed.select(col("b").as("page")))
          .groupBy(col("page")).agg(count(lit(1)).as(name))
      def peel(ed: DataFrame, rm: DataFrame): DataFrame =
        ed.join(rm.withColumnRenamed("page", "a"), Seq("a"), "left_anti")
          .join(rm.withColumnRenamed("page", "b"), Seq("b"), "left_anti")
      // d0/d1 cached: each feeds BOTH the next peel round and the final
      // degree-trajectory join — uncached, the deeper rounds re-derive
      // every earlier round's agg+anti-join chain (page-count-sized
      // (page, int64) frames, the q_conductance core discipline)
      val d0  = degOf(und, "deg0").cache()
      val e1  = peel(und, d0.filter(col("deg0") < KCoreK).select(col("page")))
      val d1  = degOf(e1, "deg1").cache()
      val e2  = peel(e1, d1.filter(col("deg1") < KCoreK).select(col("page")))
      val d2  = degOf(e2, "deg2")
      d0.join(d1, Seq("page"), "left").join(d2, Seq("page"), "left")
        .select(col("page"), col("deg0"),
          coalesce(col("deg1"), lit(0L)).as("deg1"),
          coalesce(col("deg2"), lit(0L)).as("deg2"))
        .withColumn("removed_round",
          when(col("deg0") < KCoreK, 1L)
            .when(col("deg1") < KCoreK, 2L).otherwise(0L))
    }),

    // Conductance of the k-core (Kannan–Vempala–Vetta's cut quality,
    // φ(S) = cut(S, S̄) / min(vol S, vol S̄)) — the number that says
    // whether the surviving core is a genuine tight community (link
    // farms score LOW: dense inside, few edges out) or just the dense
    // end of a smooth graph. S = the pages still carrying an edge after
    // q_kcore_peel's two rounds; every quantity is an integer edge
    // count, so the ppm is exact. Scale shape: one broadcast
    // membership join onto the edge list + a 3-counter aggregation —
    // rides the peel's own frames.
    "q_conductance" -> ((s, dir) => {
      val und = pageEdges(s, dir)
      def degOf(ed: DataFrame, name: String): DataFrame =
        ed.select(col("a").as("page")).unionAll(ed.select(col("b").as("page")))
          .groupBy(col("page")).agg(count(lit(1)).as(name))
      def peel(ed: DataFrame, rm: DataFrame): DataFrame =
        ed.join(rm.withColumnRenamed("page", "a"), Seq("a"), "left_anti")
          .join(rm.withColumnRenamed("page", "b"), Seq("b"), "left_anti")
      val d0   = degOf(und, "deg0")
      val e1   = peel(und, d0.filter(col("deg0") < KCoreK).select(col("page")))
      val d1   = degOf(e1, "deg1")
      val e2   = peel(e1, d1.filter(col("deg1") < KCoreK).select(col("page")))
      // cached: core is read THREE times (both membership broadcasts +
      // the n_core agg) and each read otherwise re-derives the whole
      // two-round peel chain; the frame is page ids only
      val core = degOf(e2, "deg2").select(col("page")).withColumn("in_core", lit(1))
        .cache()
      val tagged = und
        .join(broadcast(core.select(col("page").as("a"), col("in_core").as("ia"))), Seq("a"), "left")
        .join(broadcast(core.select(col("page").as("b"), col("in_core").as("ib"))), Seq("b"), "left")
        .select(coalesce(col("ia"), lit(0)).as("ia"), coalesce(col("ib"), lit(0)).as("ib"))
      tagged.agg(
          count(lit(1)).as("n_edges"),
          sum(when(col("ia") === 1 && col("ib") === 1, 1L).otherwise(0L)).as("edges_in"),
          sum(when(col("ia") + col("ib") === 1, 1L).otherwise(0L)).as("cut"))
        .crossJoin(broadcast(core.agg(count(lit(1)).as("n_core"))))
        .select(col("n_core"), col("n_edges"), col("edges_in"), col("cut"),
          expr("2 * edges_in + cut").as("vol_core"),
          expr("2 * (n_edges - edges_in - cut) + cut").as("vol_rest"))
        .withColumn("phi_ppm",
          when(least(col("vol_core"), col("vol_rest")) === 0L, lit(0L))
            .otherwise(expr("(cut * 1000000) DIV least(vol_core, vol_rest)")))
    }),

    // Degree assortativity (Newman 2002) of the page graph — the one-
    // number structure diagnostic crawl QA watches: social/citation
    // graphs are assortative (hubs link hubs), the web is DISassortative
    // (hubs link leaves), and a link farm shifts it measurably. For the
    // undirected symmetric case Pearson's r is RATIONAL — r = (M·Sxy −
    // Sx²)/(M·Sx² − Sx²) over the ordered-endpoint-degree pairs — so the
    // whole statistic is exact int64 (no sqrt, no float, order-free) and
    // the ppm is a sign-correct FLOOR division (pmod emulation on the
    // Spark side == DuckDB's `//`). Scale shape: two broadcast degree
    // joins onto the edge list + one global aggregation of int counters
    // (map-side combined, 4 numbers) — edges never shuffle wider than
    // (a, b, two longs). Headroom: M·Sxy ≤ int64 bounds one pass (~10⁹
    // edges at deg ~10³); past that production scales degrees down or
    // goes double — ANSI throws loudly at the boundary.
    "q_assortativity" -> ((s, dir) => {
      val und = pageEdges(s, dir)
      val dg = und.select(col("a").as("page")).unionAll(und.select(col("b").as("page")))
        .groupBy(col("page")).agg(count(lit(1)).as("deg"))
      val withDeg = und
        .join(dg.select(col("page").as("a"), col("deg").as("da")), Seq("a"))
        .join(dg.select(col("page").as("b"), col("deg").as("db")), Seq("b"))
      val ordered = withDeg.select(col("da").as("x"), col("db").as("y"))
        .unionAll(withDeg.select(col("db").as("x"), col("da").as("y")))
      ordered.agg(count(lit(1)).as("m2"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sx2"))
        .select(col("m2"), col("sxy"), col("sx"), col("sx2"),
          expr("m2 * sxy - sx * sx").as("num"),
          expr("m2 * sx2 - sx * sx").as("den"))
        .withColumn("r_ppm",
          when(col("den") === 0L, lit(0L)).otherwise(
            expr("(num * 1000000 - pmod(num * 1000000, den)) div den")))
    }),

    // Semi-supervised label propagation (Zhu & Ghahramani's hard-label
    // variant) on the host graph: LabelSeeds seed hosts carry known
    // labels (their own index — topic tags, spam verdicts, language
    // labels in a real crawl); each round every UNLABELED host adopts the
    // majority label among its labeled neighbors, ties to the smallest
    // label, and labeled hosts are frozen. Two rounds are unrolled (the
    // sf graph reaches everything in 2 — production loops until the
    // frontier empties, the BFS discipline). Scale shape per round: one
    // equi-join of the edge list against the labeled set (broadcastable —
    // it is the frontier, not the corpus) + a (host, label) counted
    // aggregate + a per-host argmax window over ≤|labels| rows; shuffles
    // carry (host, label, count). The deterministic tie-break is what
    // makes the result engine-exact rather than seed-order-dependent.
    "q_label_prop" -> ((s, dir) => {
      val und = hostEdges(s, dir).select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
      // host-pair rows only (≤ |hosts|² and tiny in practice) — nb feeds
      // FOUR joins (anti + label per propagate round) and hosts; uncached,
      // each consumer re-ran the docs scan + distinct edge derivation
      val nb = und.select(col("a").as("h"), col("b").as("n"))
        .unionByName(und.select(col("b").as("h"), col("a").as("n")))
        .cache()
      val hosts = nb.select(col("h")).distinct()
      val seeds = hosts
        .filter(substring(col("h"), 4, 6).cast("int") < LabelSeeds)
        .select(col("h"), substring(col("h"), 4, 6).cast("long").as("label"),
          lit(0L).as("round_assigned"))
      def propagate(labeled: DataFrame, round: Int): DataFrame = {
        // argmax via max_by(struct(votes, -label)) ≡ rank 1 of (votes
        // DESC, label ASC) — a partial-aggregating groupBy instead of a
        // per-host window sort (one less sort pass per round; a hot host
        // collapses map-side)
        val won = nb.join(labeled.select(col("h")), Seq("h"), "left_anti")
          .join(labeled.select(col("h").as("n"), col("label")), Seq("n"))
          .groupBy(col("h"), col("label")).agg(count(lit(1)).as("votes"))
          .groupBy(col("h"))
          .agg(max_by(col("label"), struct(col("votes"), -col("label"))).as("label"))
          .select(col("h"), col("label"), lit(round.toLong).as("round_assigned"))
        labeled.unionByName(won)
      }
      // round-1 labels are read twice by round 2 (anti-join + label join);
      // the pin keeps the round-1 vote aggregation single-execution
      val l1 = propagate(seeds, 1).cache()
      hosts.join(propagate(l1, 2), Seq("h"), "left_outer")
        .select(col("h").as("host"),
          coalesce(col("label"), lit(-1L)).as("label"),
          coalesce(col("round_assigned"), lit(-1L)).as("round_assigned"))
    }),

    // Newman–Girvan modularity of the label-prop communities — the
    // quality score that tells you whether the propagation produced real
    // structure or noise (Q > 0.3 ≈ meaningful). Kept EXACT in int64 by
    // clearing denominators: Q·4m² = Σ_c (4m·in_c − deg_c²); the ppm
    // uses the floor-division recipe because contributions go negative.
    // Unlabeled hosts count as their own singleton community. Scale
    // shape: in-community edges are two host-keyed equi-joins of the
    // edge list against the (host, community) table + a partial agg per
    // community; degree sums ride the same table; m is a 1-row broadcast.
    // The (host, community) table and the per-community frame are each
    // CACHED: comm feeds three joins and per feeds both union branches —
    // uncached, the whole label-prop DAG (2 window rounds) re-ran ~6×
    // (35.6 s vs ~3 s for label-prop itself in the sf0.1 bench).
    "q_graph_modularity" -> ((s, dir) => {
      val und = hostEdges(s, dir).select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct().cache()
      val comm = queries("q_label_prop")(s, dir)
        .select(col("host"),
          when(col("label") >= 0, concat(lit("c"), col("label")))
            .otherwise(concat(lit("solo_"), col("host"))).as("comm"))
        .cache()
      val mRow = und.agg(count(lit(1)).as("m"))
      val deg = und.select(col("a").as("host"))
        .unionByName(und.select(col("b").as("host")))
        .groupBy(col("host")).agg(count(lit(1)).as("deg"))
      val inEdges = und
        .join(comm.select(col("host").as("a"), col("comm").as("ca")), Seq("a"))
        .join(comm.select(col("host").as("b"), col("comm").as("cb")), Seq("b"))
        .filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("comm")).agg(count(lit(1)).as("in_edges"))
      val modPpm =
        "(contrib * 1000000 - pmod(contrib * 1000000, 4 * m * m)) div (4 * m * m)"
      val per = comm.join(deg, Seq("host"))
        .groupBy(col("comm"))
        .agg(count(lit(1)).as("n_hosts"), sum(col("deg")).as("deg_sum"))
        .join(inEdges, Seq("comm"), "left_outer")
        .withColumn("in_edges", coalesce(col("in_edges"), lit(0L)))
        .crossJoin(broadcast(mRow))
        .withColumn("contrib", expr("4 * m * in_edges - deg_sum * deg_sum"))
        .select(col("comm").as("community"), col("n_hosts"), col("in_edges"),
          col("deg_sum"), col("contrib"), expr(modPpm).as("modularity_ppm"),
          col("m"))
        .cache()
      val all = per
        .agg(sum(col("n_hosts")).as("n_hosts"), sum(col("in_edges")).as("in_edges"),
          sum(col("deg_sum")).as("deg_sum"), sum(col("contrib")).as("contrib"),
          max(col("m")).as("m"))
        .select(lit("(all)").as("community"), col("n_hosts"), col("in_edges"),
          col("deg_sum"), col("contrib"), expr(modPpm).as("modularity_ppm"))
      per.drop("m").unionByName(all)
    }),

    // Link co-citation (bibliographic coupling): host pairs ranked by the
    // overlap of their distinct outlink-target sets — integer-ppm Jaccard,
    // pairs sharing <2 targets dropped as noise. The link-graph twin of
    // the content-based q_mirror_hosts. Scale shape: pairs are minted
    // THROUGH the shared target, so a favicon.ico-class sink with
    // in-degree d would mint d² rows; the same deterministic MaxNeighbors
    // row_number cap as q_link_prediction bounds every target's
    // contribution to MaxNeighbors² (first MaxNeighbors sources by name —
    // mirrored in the oracle; na/nb stay exact, computed pre-cap).
    "q_link_cocitation" -> ((s, dir) => {
      val e     = hostEdges(s, dir).select(col("src"), col("dst")).distinct()
      val sizes = e.groupBy(col("src")).agg(count(lit(1)).as("n"))
      val capped = capPerKey(e, "dst", "src", MaxNeighbors)
      val pairs = capped.select(col("src").as("host_a"), col("dst"))
        .join(capped.select(col("src").as("host_b"), col("dst")), Seq("dst"))
        .filter(col("host_a") < col("host_b"))
        .groupBy(col("host_a"), col("host_b"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
      pairs
        .join(sizes.withColumnRenamed("src", "host_a").withColumnRenamed("n", "na"), Seq("host_a"))
        .join(sizes.withColumnRenamed("src", "host_b").withColumnRenamed("n", "nb"), Seq("host_b"))
        .select(col("host_a"), col("host_b"), col("shared"), col("na"), col("nb"),
          expr("(shared * 1000000) div (na + nb - shared)").as("jaccard_ppm"))
    }),

    // Seed-set frontier expansion: BFS layers from seed host src0 over the
    // host link graph — min-depth per discovered host, 2 layers unrolled
    // (the sf graph's diameter from the hub). Production iterates the same
    // frontier⋈edges + visited anti-join until empty.
    "q_frontier_bfs" -> ((s, dir) => {
      import s.implicits._
      val e  = hostEdges(s, dir) // host-count-sized; recompute beats a cache pin
      val d0 = Seq("src0").toDF("host")
      val d1 = e.join(broadcast(d0), e("src") === d0("host"))
        .select(col("dst").as("host")).distinct()
        .join(broadcast(d0), Seq("host"), "left_anti")
      val v1 = d0.unionByName(d1)
      val d2 = e.join(broadcast(d1), e("src") === d1("host"))
        .select(col("dst").as("host")).distinct()
        .join(broadcast(v1), Seq("host"), "left_anti")
      d0.select(col("host"), lit(0L).as("depth"))
        .unionByName(d1.select(col("host"), lit(1L).as("depth")))
        .unionByName(d2.select(col("host"), lit(2L).as("depth")))
    }),

    // Deterministic random-walk corpus over the host graph — the
    // DeepWalk/node2vec TRAINING-DATA generator (Perozzi et al., KDD
    // 2014): one walk per start host, RwLen hops, next hop = the
    // out-neighbor minimizing a (node, step, neighbor)-keyed hash — a
    // hash-seeded "random" choice both engines replay bit-exactly, the
    // same trick q_train_split uses instead of rand(). A walk ending at
    // a sink host stops early (no self-loop padding — mirrored). Scale
    // shape: each hop is one frontier⋈edges equi-join on ids + a
    // struct-min partial agg per walk (argmin without a window); the
    // frontier never exceeds one row per walk, so RwLen hops cost RwLen
    // joins over (walk, node) pairs — hosts × L, not edges × L.
    "q_random_walks" -> ((s, dir) => {
      val e = hostEdges(s, dir).cache()
      var cur = e.select(col("src").as("walk")).distinct()
        .select(col("walk"), col("walk").as("node"))
      var out = cur.select(col("walk"), col("node"), lit(0L).as("step"))
      for (t <- 1 to RwLen) {
        cur = cur.join(e, cur("node") === e("src"))
          .select(col("walk"),
            hex32(concat(col("node"), lit(s"|$t|"), col("dst"))).as("h"),
            col("dst"))
          .groupBy(col("walk"))
          .agg(min(struct(col("h"), col("dst"))).as("m"))
          .select(col("walk"), col("m.dst").as("node"))
        out = out.unionByName(
          cur.select(col("walk"), col("node"), lit(t.toLong).as("step")))
      }
      out
    }),

    // Skip-gram pair extraction from the walk corpus — the second half
    // of the DeepWalk recipe: every (center, context) host pair within
    // SkipW steps on the same walk, with its corpus frequency. This is
    // the actual training-pair table a graph-embedding job feeds to its
    // skip-gram trainer. Scale shape: a self-equi-join of the walk trace
    // on walk id (each side ≤ RwLen+1 rows per walk — the fan-out is the
    // window width, not a degree), then one partial-agg count keyed by
    // the (center, context) host pair.
    "q_walk_skipgrams" -> ((s, dir) => {
      // materialized once: the walk trace is an RwLen-hop iterative chain
      // (a join + struct-min agg per hop), and the skip-gram self-join
      // reads it on BOTH sides — un-materialized, the whole chain
      // executed twice (measured ~2× the standalone q_random_walks cost).
      // walks × (RwLen+1) id rows only — trivially checkpointed.
      val w = queries("q_random_walks")(s, dir).localCheckpoint()
      w.as("a").join(w.as("b"),
          col("a.walk") === col("b.walk") &&
            col("a.step") =!= col("b.step") &&
            abs(col("a.step") - col("b.step")) <= SkipW)
        .groupBy(col("a.node").as("center"), col("b.node").as("context"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // Posting-list compression accounting: per term, the exact encoded
    // size of the doc-gap stream under Elias-gamma and LEB128-varint vs
    // fixed 64-bit — the index-capacity planning numbers. Values are
    // first_doc_id+1 then gaps (all ≥ 1, gamma-encodable); ⌊log2 v⌋ =
    // length(bin(v))-1 in both engines, no float log.
    "search_gamma_bits" -> ((s, dir) => {
      val post = docs(s, dir)
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
      val vals = post
        .withColumn("prev", lag(col("doc_id"), 1).over(w))
        .withColumn("v", when(col("prev").isNull, col("doc_id") + 1)
          .otherwise(col("doc_id") - col("prev")))
        .withColumn("lg", (length(bin(col("v"))) - 1).cast("long"))
      vals.groupBy(col("term")).agg(
          count(lit(1)).as("n_postings"),
          sum(col("lg") * 2 + 1).as("gamma_bits"),
          sum(expr("lg div 7") + 1).as("varint_bytes"))
        .select(col("term"), col("n_postings"), col("gamma_bits"),
          col("varint_bytes"), (col("n_postings") * 64L).as("fixed64_bits"))
    }),

    // Change-rate-driven recrawl scheduling: events replay as fetch
    // observations of ~97 URLs (user_id mod 97); a change is an observed
    // content-signature flip vs the previous observation (event_type as
    // the deterministic signature stand-in). change_ppm in [0, 1M] maps to
    // a next-fetch interval of 1 day (never changes) down to ~86 s (flips
    // every observation) — pure integer, epoch-µs timestamps both engines.
    // One window pass per URL + one aggregation; nothing corpus-wide.
    "q_recrawl_schedule" -> ((s, dir) => {
      val obs = s.read.parquet(s"$dir/events.parquet")
        .select((col("user_id") % 97L).as("url_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"), col("event_type"))
      val w = Window.partitionBy(col("url_id")).orderBy(col("us"), col("event_id"))
      obs.withColumn("prev", lag(col("event_type"), 1).over(w))
        .withColumn("chg",
          when(col("prev").isNotNull && col("prev") =!= col("event_type"), 1L)
            .otherwise(0L))
        .groupBy(col("url_id")).agg(
          count(lit(1)).as("nobs"),
          sum(col("chg")).as("nchanged"),
          max(col("us")).as("last_us"))
        .withColumn("change_ppm",
          when(col("nobs") > 1, expr("(nchanged * 1000000) div (nobs - 1)"))
            .otherwise(lit(0L)))
        .select(col("url_id"), col("nobs"), col("nchanged"), col("change_ppm"),
          col("last_us"),
          (col("last_us") + expr("86400000000000 div (change_ppm + 1000)"))
            .as("next_fetch_us"))
    }),

    // Global crawl-budget apportionment (Hamilton / largest-remainder):
    // a budget of 1000 fetches split across hosts proportional to content
    // mass (Σ n_chars) — floor quotas, then the leftover seats to the
    // largest fractional remainders (host-asc tiebreak). Exactly sums to
    // the budget by construction. Host-count-sized frames throughout; the
    // only corpus-wide work is the map-side-combined mass aggregation.
    "q_crawl_budget" -> ((s, dir) => {
      val mass = docs(s, dir).groupBy(col("source").as("host"))
        .agg(sum(col("n_chars")).as("mass"))
      val total = mass.agg(sum(col("mass")).as("total"))
      val q = mass.crossJoin(broadcast(total))
        .withColumn("floor_k", expr("(1000 * mass) div total"))
        .withColumn("rem", expr("(1000 * mass) % total"))
      val extras = q.agg((lit(1000L) - sum(col("floor_k"))).as("n_extra"))
      q.crossJoin(broadcast(extras))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("host"))).cast("long"))
        .select(col("host"), col("mass"), col("floor_k"), col("rem"), col("rk"),
          (col("floor_k") + when(col("rk") <= col("n_extra"), 1L).otherwise(0L))
            .as("alloc"))
    }),

    // Tokenizer-vocabulary coverage curve: terms ranked by corpus
    // frequency (cf desc, term asc); at each power-of-two rank, the
    // cumulative share of all token occurrences a vocab of that size
    // covers (integer ppm) — the "how big must the vocab be" planning
    // curve next to text_bpe_merges.
    "q_vocab_coverage" -> ((s, dir) => {
      val cf = docs(s, dir)
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cf"))
      val total = cf.agg(sum(col("cf")).as("total")) // 1-row frame, broadcast
      val w     = Window.orderBy(col("cf").desc, col("term"))
      cf.withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("cum_cf", sum(col("cf")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter((col("rank").bitwiseAND(col("rank") - 1)) === 0)
        .crossJoin(broadcast(total))
        .select(col("rank"), col("term"), col("cf"), col("cum_cf"),
          expr("(cum_cf * 1000000) div total").as("coverage_ppm"))
    }),

    // HITS hubs & authorities (Kleinberg 1999) over the host link graph —
    // the second classic link-quality prior next to `q_host_pagerank`:
    // a page that LINKS TO many good pages (hub) is a different crawl
    // signal than a page many good pages LINK TO (authority); crawl
    // seeding wants hubs, quality weighting wants authorities. Two
    // mutual-reinforcement iterations unrolled in EXACT integer
    // arithmetic: scores live as ppm of the L1 total (auth = Σ hub of
    // in-neighbors, then ·1e6 div Σ — the k-means/PageRank
    // integer-fixpoint rule; the textbook L2 normalization is a monotone
    // per-vector rescale, so L1-in-int64 preserves the ranking while
    // making every prefix hash-exact cross-engine). Scale shape: the
    // edge set is host-pair-sized (distinct host→host), each half-step
    // is one broadcastable score-table join + one (host, int64)
    // aggregate — the exact per-round discipline of the CC and PageRank
    // iterations; nothing corpus-sized moves after the one groupBy that
    // builds the edges.
    "q_host_hits" -> ((s, dir) => {
      // the four unrolled half-steps reference the edge set ~2^4 times
      // through their lineage; cached, each reference is a host-pair-sized
      // read instead of a corpus scan + distinct (12.7 s → sub-second at
      // sf0.1). At scale the edge list is a stored table, derived never.
      val e = hostEdges(s, dir).cache()
      val hosts = e.select(col("src").as("host"))
        .unionByName(e.select(col("dst").as("host"))).distinct().cache()
      // each half-step's raw scores are referenced twice (the L1 total and
      // the rescale) and feed the next half-step — left lazy, the lineage
      // doubles per step (2^4 subtrees ⇒ ~12 s of re-planned tiny stages
      // at sf0.1). localCheckpoint materializes the host-sized score table
      // once per step (the kmeans-centroid discipline: an iterative
      // fixpoint's per-round result is DATA, not a plan to replay).
      def normPpm(r0: DataFrame, c: String): DataFrame = {
        val r = r0.localCheckpoint()
        val t = r.agg(sum(col(c)).as("t"))
        r.crossJoin(broadcast(t))
          .select(col("host"), expr(s"($c * 1000000) div t").as(c))
      }
      def authStep(hub: DataFrame): DataFrame = normPpm(
        hosts.join(
          e.join(broadcast(hub.withColumnRenamed("host", "src")), Seq("src"))
            .groupBy(col("dst").as("host")).agg(sum(col("h")).as("a")),
          Seq("host"), "left")
          .select(col("host"), coalesce(col("a"), lit(0L)).as("a")), "a")
      def hubStep(auth: DataFrame): DataFrame = normPpm(
        hosts.join(
          e.join(broadcast(auth.withColumnRenamed("host", "dst")), Seq("dst"))
            .groupBy(col("src").as("host")).agg(sum(col("a")).as("h")),
          Seq("host"), "left")
          .select(col("host"), coalesce(col("h"), lit(0L)).as("h")), "h")
      val a1 = authStep(hosts.withColumn("h", lit(1000000L)))
      val h1 = hubStep(a1)
      val a2 = authStep(h1)
      val h2 = hubStep(a2)
      val outd = e.groupBy(col("src").as("host")).agg(count(lit(1)).as("out_deg"))
      val ind  = e.groupBy(col("dst").as("host")).agg(count(lit(1)).as("in_deg"))
      hosts
        .join(outd, Seq("host"), "left").join(ind, Seq("host"), "left")
        .join(a2.withColumnRenamed("a", "auth_ppm"), Seq("host"))
        .join(h2.withColumnRenamed("h", "hub_ppm"), Seq("host"))
        .select(col("host"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"),
          col("auth_ppm"), col("hub_ppm"))
        .withColumn("auth_rank", dense_rank().over(
          Window.orderBy(col("auth_ppm").desc, col("host").asc)).cast("long"))
    }),

    // Link reciprocity — the classic link-farm signal (organic host
    // graphs are strongly asymmetric; paired "you link me, I link you"
    // exchanges push a host's reciprocated-edge share toward 1): per
    // host, what fraction of its distinct out-links are reciprocated by
    // a reverse edge, in exact ppm, flagged at ≥ 50%. The rank/crawl
    // priors above consume this as a discount. Scale shape: one
    // self-join of the host-pair edge set on the REVERSED key — edges
    // are host-pair-sized (≪ docs) and the join key is (host, host);
    // per-host rollup is a map-side-combined count pair.
    "q_reciprocal_links" -> ((s, dir) => {
      val e = hostEdges(s, dir)
      val rev = e.select(col("dst").as("src"), col("src").as("dst"))
        .withColumn("m", lit(1))
      e.join(rev, Seq("src", "dst"), "left")
        .groupBy(col("src").as("host"))
        .agg(count(lit(1)).as("out_deg"), count(col("m")).as("n_recip"))
        .select(col("host"), col("out_deg"), col("n_recip"),
          expr("(n_recip * 1000000) div out_deg").as("recip_ppm"))
        .withColumn("link_farm_flag", col("recip_ppm") >= 500000L)
    }))

  // --- DuckDB oracles -------------------------------------------------------

  val oracles: Map[String, String] = Map(
    "q_crawl_schedule" ->
      s"""WITH q AS (
         |  SELECT doc_id, source AS host,
         |    CAST(substr(source, 4) AS INT) AS h,
         |    (doc_id * 37 % 97)::BIGINT AS priority
         |  FROM documents),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY host ORDER BY priority DESC, doc_id)::BIGINT AS queue_pos
         |  FROM q)
         |SELECT doc_id, host, priority, queue_pos,
         |  ((queue_pos - 1) * (500 + (h % 4) * 250))::BIGINT AS fetch_ms,
         |  (((queue_pos - 1) * (500 + (h % 4) * 250)) // 60000)::BIGINT AS minute
         |FROM r""".stripMargin,

    "q_link_cocitation" ->
      s"""WITH e0 AS ($dkHostEdges),
         |e AS (SELECT DISTINCT src, dst FROM e0),
         |sz AS (SELECT src, count(*)::BIGINT AS n FROM e GROUP BY 1),
         |capped AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY dst ORDER BY src) AS rn FROM e)
         |  WHERE rn <= $MaxNeighbors),
         |p AS (
         |  SELECT a.src AS host_a, b.src AS host_b, count(*)::BIGINT AS shared
         |  FROM capped a JOIN capped b ON a.dst = b.dst AND a.src < b.src
         |  GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT host_a, host_b, shared, sa.n AS na, sb.n AS nb,
         |  (shared * 1000000 // (sa.n + sb.n - shared))::BIGINT AS jaccard_ppm
         |FROM p JOIN sz sa ON p.host_a = sa.src JOIN sz sb ON p.host_b = sb.src""".stripMargin,

    "q_triangle_count" ->
      s"""WITH e AS ($dkHostEdges),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
         |deg AS (
         |  SELECT h, count(*)::BIGINT AS deg FROM (
         |    SELECT a AS h FROM und UNION ALL SELECT b AS h FROM und)
         |  GROUP BY 1),
         |o AS (
         |  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND und.a < und.b)
         |           THEN und.a ELSE und.b END AS u,
         |         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND und.a < und.b)
         |           THEN und.b ELSE und.a END AS v
         |  FROM und JOIN deg d1 ON d1.h = und.a JOIN deg d2 ON d2.h = und.b),
         |wedges AS (
         |  SELECT o1.u, o1.v AS x, o2.v AS y
         |  FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v),
         |closing AS (SELECT u AS x, v AS y FROM o UNION ALL SELECT v AS x, u AS y FROM o),
         |tri AS (SELECT w.u, w.x, w.y FROM wedges w JOIN closing c ON w.x = c.x AND w.y = c.y),
         |per AS (
         |  SELECT h, count(*)::BIGINT AS n_triangles FROM (
         |    SELECT u AS h FROM tri UNION ALL SELECT x AS h FROM tri
         |    UNION ALL SELECT y AS h FROM tri)
         |  GROUP BY 1)
         |SELECT deg.h AS host, deg.deg, coalesce(per.n_triangles, 0)::BIGINT AS n_triangles,
         |  (CASE WHEN deg.deg >= 2
         |     THEN (2 * coalesce(per.n_triangles, 0) * 1000000) // (deg.deg * (deg.deg - 1))
         |     ELSE 0 END)::BIGINT AS clustering_ppm
         |FROM deg LEFT JOIN per ON per.h = deg.h""".stripMargin,

    "q_link_prediction" ->
      s"""WITH e AS ($dkHostEdges),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e),
         |nb AS (SELECT a AS z, b AS n FROM und UNION ALL SELECT b AS z, a AS n FROM und),
         |deg AS (SELECT z, count(*)::BIGINT AS deg FROM nb GROUP BY 1),
         |capped AS (
         |  SELECT z, n FROM (
         |    SELECT z, n, row_number() OVER (PARTITION BY z ORDER BY n) AS rn FROM nb)
         |  WHERE rn <= $MaxNeighbors),
         |p AS (
         |  SELECT l.z, l.n AS x, r.n AS y
         |  FROM capped l JOIN capped r ON l.z = r.z AND l.n < r.n),
         |sc AS (
         |  SELECT x, y, count(*)::BIGINT AS n_common,
         |    sum(1000000 // deg.deg)::BIGINT AS ra_ppm
         |  FROM p JOIN deg ON deg.z = p.z GROUP BY 1, 2)
         |SELECT sc.x AS host_a, sc.y AS host_b, n_common, ra_ppm
         |FROM sc ANTI JOIN und ON sc.x = und.a AND sc.y = und.b""".stripMargin,

    "q_hyperball" ->
      s"""WITH $dkHyperballCtes
         |SELECT * FROM ests""".stripMargin,

    "q_effective_diameter" ->
      s"""WITH $dkHyperballCtes,
         |nf AS (
         |  SELECT radius, sum(CAST(round(estimate * 10000) AS BIGINT))::BIGINT AS nf_e4
         |  FROM ests GROUP BY 1),
         |d AS (
         |  SELECT radius, nf_e4,
         |    (nf_e4 - coalesce(lag(nf_e4) OVER (ORDER BY radius), 0))::BIGINT AS delta_e4
         |  FROM nf),
         |tot AS (
         |  SELECT nf_e4 AS nf_max_e4, ((9 * nf_e4) // 10)::BIGINT AS thr_e4
         |  FROM nf ORDER BY radius DESC LIMIT 1),
         |avg AS (
         |  SELECT ((sum(radius * delta_e4) * 1000000) // max(nf_max_e4))::BIGINT AS avg_dist_ppm
         |  FROM d, tot),
         |eff AS (
         |  SELECT (CASE WHEN radius = 0 THEN 0
         |    ELSE (radius - 1) * 1000000 +
         |      ((thr_e4 - (nf_e4 - delta_e4)) * 1000000) // delta_e4 END)::BIGINT AS eff_diam_ppm
         |  FROM d, tot WHERE nf_e4 >= thr_e4 ORDER BY radius LIMIT 1)
         |SELECT d.radius, d.nf_e4, d.delta_e4,
         |  ((d.nf_e4 * 1000000) // tot.nf_max_e4)::BIGINT AS frac_ppm,
         |  avg.avg_dist_ppm, eff.eff_diam_ppm
         |FROM d, tot, avg, eff""".stripMargin,

    "q_kcore_peel" ->
      s"""WITH $dkPeelCtes
         |SELECT d0.page, d0.deg0, coalesce(d1.deg1, 0)::BIGINT AS deg1,
         |  coalesce(d2.deg2, 0)::BIGINT AS deg2,
         |  (CASE WHEN d0.deg0 < $KCoreK THEN 1
         |    WHEN coalesce(d1.deg1, 0) < $KCoreK THEN 2 ELSE 0 END)::BIGINT AS removed_round
         |FROM d0 LEFT JOIN d1 ON d0.page = d1.page
         |LEFT JOIN d2 ON d0.page = d2.page""".stripMargin,

    "q_conductance" ->
      s"""WITH $dkPeelCtes,
         |core AS (SELECT DISTINCT page FROM (
         |  SELECT a AS page FROM e2 UNION ALL SELECT b FROM e2)),
         |t AS (
         |  SELECT (CASE WHEN a IN (SELECT page FROM core) THEN 1 ELSE 0 END) AS ia,
         |    (CASE WHEN b IN (SELECT page FROM core) THEN 1 ELSE 0 END) AS ib
         |  FROM pund),
         |agg AS (
         |  SELECT count(*)::BIGINT AS n_edges,
         |    sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)::BIGINT AS edges_in,
         |    sum(CASE WHEN ia + ib = 1 THEN 1 ELSE 0 END)::BIGINT AS cut
         |  FROM t),
         |nc AS (SELECT count(*)::BIGINT AS n_core FROM core),
         |v AS (
         |  SELECT n_core, n_edges, edges_in, cut,
         |    (2 * edges_in + cut)::BIGINT AS vol_core,
         |    (2 * (n_edges - edges_in - cut) + cut)::BIGINT AS vol_rest
         |  FROM agg, nc)
         |SELECT n_core, n_edges, edges_in, cut, vol_core, vol_rest,
         |  (CASE WHEN least(vol_core, vol_rest) = 0 THEN 0
         |    ELSE (cut * 1000000) // least(vol_core, vol_rest) END)::BIGINT AS phi_ppm
         |FROM v""".stripMargin,

    "q_assortativity" ->
      s"""WITH $dkPageEdges,
         |dg AS (SELECT page, count(*)::BIGINT AS deg FROM (
         |    SELECT a AS page FROM pund UNION ALL SELECT b FROM pund) GROUP BY 1),
         |wd AS (
         |  SELECT la.deg AS da, lb.deg AS db
         |  FROM pund JOIN dg la ON pund.a = la.page JOIN dg lb ON pund.b = lb.page),
         |o AS (SELECT da AS x, db AS y FROM wd UNION ALL SELECT db, da FROM wd),
         |s AS (
         |  SELECT count(*)::BIGINT AS m2, sum(x * y)::BIGINT AS sxy,
         |    sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sx2
         |  FROM o),
         |s2 AS (
         |  SELECT m2, sxy, sx, sx2,
         |    (m2 * sxy - sx * sx)::BIGINT AS num,
         |    (m2 * sx2 - sx * sx)::BIGINT AS den
         |  FROM s)
         |-- DuckDB // truncates toward zero on negatives; emulate FLOOR via
         |-- the pmod identity so a disassortative (negative) r matches Spark
         |SELECT m2, sxy, sx, sx2, num, den,
         |  (CASE WHEN den = 0 THEN 0
         |    ELSE (num * 1000000 - ((num * 1000000 % den + den) % den)) // den
         |  END)::BIGINT AS r_ppm
         |FROM s2""".stripMargin,

    "q_label_prop" ->
      s"""WITH e AS ($dkHostEdges),
         |$dkLabelPropCtes
         |$dkLabelPropSelect""".stripMargin,

    // communities = the label-prop result (shared CTEs; unlabeled hosts
    // are their own singleton); Q·4m² = Σ_c (4m·in_c − deg_c²) keeps
    // Newman–Girvan modularity exact in int64 — the ppm uses the
    // floor-division recipe since contributions can be negative
    "q_graph_modularity" ->
      s"""WITH e AS ($dkHostEdges),
         |$dkLabelPropCtes,
         |lab AS ($dkLabelPropSelect),
         |comm AS (
         |  SELECT host, CASE WHEN label >= 0 THEN 'c' || label::VARCHAR
         |    ELSE 'solo_' || host END AS comm
         |  FROM lab),
         |mm AS (SELECT count(*)::BIGINT AS m FROM und),
         |deg AS (
         |  SELECT h AS host, count(*)::BIGINT AS deg FROM
         |    (SELECT a AS h FROM und UNION ALL SELECT b AS h FROM und)
         |  GROUP BY 1),
         |ie AS (
         |  SELECT ca.comm, count(*)::BIGINT AS in_edges
         |  FROM und JOIN comm ca ON ca.host = und.a
         |  JOIN comm cb ON cb.host = und.b
         |  WHERE ca.comm = cb.comm GROUP BY 1),
         |dc AS (
         |  SELECT comm, count(*)::BIGINT AS n_hosts, sum(deg)::BIGINT AS deg_sum
         |  FROM comm JOIN deg USING (host) GROUP BY 1),
         |per AS (
         |  SELECT dc.comm AS community, n_hosts,
         |    coalesce(ie.in_edges, 0)::BIGINT AS in_edges, deg_sum,
         |    (4 * m * coalesce(ie.in_edges, 0)
         |      - deg_sum * deg_sum)::BIGINT AS contrib, m
         |  FROM dc LEFT JOIN ie ON ie.comm = dc.comm, mm),
         |allr AS (
         |  SELECT '(all)' AS community, sum(n_hosts)::BIGINT AS n_hosts,
         |    sum(in_edges)::BIGINT AS in_edges, sum(deg_sum)::BIGINT AS deg_sum,
         |    sum(contrib)::BIGINT AS contrib, max(m) AS m
         |  FROM per)
         |SELECT community, n_hosts, in_edges, deg_sum, contrib,
         |  ((contrib * 1000000
         |    - ((contrib * 1000000 % (4*m*m) + (4*m*m)) % (4*m*m)))
         |   // (4*m*m))::BIGINT AS modularity_ppm
         |FROM (SELECT * FROM per UNION ALL SELECT * FROM allr)""".stripMargin,

    "q_frontier_bfs" ->
      s"""WITH e AS ($dkHostEdges),
         |d1 AS (
         |  SELECT DISTINCT dst AS host FROM e WHERE src = 'src0' AND dst <> 'src0'),
         |d2 AS (
         |  SELECT DISTINCT e.dst AS host FROM e JOIN d1 ON e.src = d1.host
         |  WHERE e.dst <> 'src0' AND e.dst NOT IN (SELECT host FROM d1))
         |SELECT 'src0' AS host, 0::BIGINT AS depth
         |UNION ALL SELECT host, 1::BIGINT FROM d1
         |UNION ALL SELECT host, 2::BIGINT FROM d2""".stripMargin,

    // hops unrolled; each w_t picks per walk the out-neighbor with the
    // smallest (node, t, dst)-keyed hash, ties to the smallest dst
    "q_random_walks" ->
      s"""WITH e AS MATERIALIZED ($dkHostEdges),
         |$dkWalkHops
         |$dkWalkTrace""".stripMargin,

    "q_walk_skipgrams" ->
      s"""WITH e AS MATERIALIZED ($dkHostEdges),
         |$dkWalkHops,
         |walks AS MATERIALIZED ($dkWalkTrace)
         |SELECT a.node AS center, b.node AS context,
         |  count(*)::BIGINT AS n_pairs
         |FROM walks a JOIN walks b ON a.walk = b.walk
         |  AND a.step <> b.step AND abs(a.step - b.step) <= $SkipW
         |GROUP BY 1, 2""".stripMargin,

    "search_gamma_bits" ->
      s"""WITH t AS (SELECT doc_id, ${Dk.tokens("text")} AS toks FROM documents),
         |post AS (
         |  SELECT DISTINCT doc_id, unnest(toks) AS term FROM t),
         |v AS (
         |  SELECT term, doc_id,
         |    CASE WHEN lag(doc_id) OVER w IS NULL THEN doc_id + 1
         |      ELSE doc_id - lag(doc_id) OVER w END AS v
         |  FROM post WINDOW w AS (PARTITION BY term ORDER BY doc_id)),
         |lg AS (SELECT term, (length(bin(v)) - 1)::BIGINT AS lg FROM v)
         |SELECT term, count(*)::BIGINT AS n_postings,
         |  sum(lg * 2 + 1)::BIGINT AS gamma_bits,
         |  sum(lg // 7 + 1)::BIGINT AS varint_bytes,
         |  (count(*) * 64)::BIGINT AS fixed64_bits
         |FROM lg GROUP BY 1""".stripMargin,

    "q_recrawl_schedule" ->
      s"""WITH o AS (
         |  SELECT user_id % 97 AS url_id, event_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |c AS (
         |  SELECT url_id, us, event_id, event_type,
         |    lag(event_type) OVER (PARTITION BY url_id ORDER BY us, event_id) AS prev
         |  FROM o),
         |g AS (
         |  SELECT url_id, count(*)::BIGINT AS nobs,
         |    sum(CASE WHEN prev IS NOT NULL AND prev <> event_type
         |      THEN 1 ELSE 0 END)::BIGINT AS nchanged,
         |    max(us)::BIGINT AS last_us
         |  FROM c GROUP BY 1),
         |p AS (
         |  SELECT *, (CASE WHEN nobs > 1 THEN (nchanged * 1000000) // (nobs - 1)
         |    ELSE 0 END)::BIGINT AS change_ppm
         |  FROM g)
         |SELECT url_id, nobs, nchanged, change_ppm, last_us,
         |  (last_us + 86400000000000 // (change_ppm + 1000))::BIGINT AS next_fetch_us
         |FROM p""".stripMargin,

    "q_crawl_budget" ->
      s"""WITH m AS (
         |  SELECT source AS host, sum(n_chars)::BIGINT AS mass
         |  FROM documents GROUP BY 1),
         |t AS (SELECT sum(mass)::BIGINT AS total FROM m),
         |q AS (
         |  SELECT host, mass, ((1000 * mass) // total)::BIGINT AS floor_k,
         |    ((1000 * mass) % total)::BIGINT AS rem
         |  FROM m, t),
         |x AS (SELECT (1000 - sum(floor_k))::BIGINT AS n_extra FROM q),
         |r AS (
         |  SELECT *, row_number() OVER (ORDER BY rem DESC, host)::BIGINT AS rk
         |  FROM q)
         |SELECT host, mass, floor_k, rem, rk,
         |  (floor_k + CASE WHEN rk <= n_extra THEN 1 ELSE 0 END)::BIGINT AS alloc
         |FROM r, x""".stripMargin,

    "q_vocab_coverage" ->
      s"""WITH t AS (SELECT ${Dk.tokens("text")} AS toks FROM documents),
         |cf AS (
         |  SELECT term, count(*)::BIGINT AS cf
         |  FROM (SELECT unnest(toks) AS term FROM t) GROUP BY 1),
         |r AS (
         |  SELECT term, cf,
         |    row_number() OVER (ORDER BY cf DESC, term)::BIGINT AS rank,
         |    sum(cf) OVER (ORDER BY cf DESC, term
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_cf
         |  FROM cf)
         |SELECT rank, term, cf, cum_cf,
         |  (cum_cf * 1000000 // (SELECT sum(cf) FROM cf))::BIGINT AS coverage_ppm
         |FROM r WHERE (rank & (rank - 1)) = 0""".stripMargin,

    "q_host_hits" ->
      s"""WITH e AS ($dkHostEdges),
         |hosts AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
         |a1r AS (
         |  SELECT h.host, (count(e.src) * 1000000)::BIGINT AS a
         |  FROM hosts h LEFT JOIN e ON e.dst = h.host GROUP BY 1),
         |a1 AS (SELECT host, (a * 1000000 // (SELECT sum(a) FROM a1r))::BIGINT AS a FROM a1r),
         |h1r AS (
         |  SELECT h.host, coalesce(sum(a1.a), 0)::BIGINT AS hb
         |  FROM hosts h LEFT JOIN e ON e.src = h.host
         |  LEFT JOIN a1 ON a1.host = e.dst GROUP BY 1),
         |h1 AS (SELECT host, (hb * 1000000 // (SELECT sum(hb) FROM h1r))::BIGINT AS hb FROM h1r),
         |a2r AS (
         |  SELECT h.host, coalesce(sum(h1.hb), 0)::BIGINT AS a
         |  FROM hosts h LEFT JOIN e ON e.dst = h.host
         |  LEFT JOIN h1 ON h1.host = e.src GROUP BY 1),
         |a2 AS (SELECT host, (a * 1000000 // (SELECT sum(a) FROM a2r))::BIGINT AS a FROM a2r),
         |h2r AS (
         |  SELECT h.host, coalesce(sum(a2.a), 0)::BIGINT AS hb
         |  FROM hosts h LEFT JOIN e ON e.src = h.host
         |  LEFT JOIN a2 ON a2.host = e.dst GROUP BY 1),
         |h2 AS (SELECT host, (hb * 1000000 // (SELECT sum(hb) FROM h2r))::BIGINT AS hb FROM h2r),
         |od AS (SELECT src AS host, count(*)::BIGINT AS out_deg FROM e GROUP BY 1),
         |id_ AS (SELECT dst AS host, count(*)::BIGINT AS in_deg FROM e GROUP BY 1)
         |SELECT h.host, coalesce(od.out_deg, 0)::BIGINT AS out_deg,
         |  coalesce(id_.in_deg, 0)::BIGINT AS in_deg,
         |  a2.a AS auth_ppm, h2.hb AS hub_ppm,
         |  dense_rank() OVER (ORDER BY a2.a DESC, h.host)::BIGINT AS auth_rank
         |FROM hosts h
         |LEFT JOIN od ON od.host = h.host
         |LEFT JOIN id_ ON id_.host = h.host
         |JOIN a2 ON a2.host = h.host
         |JOIN h2 ON h2.host = h.host""".stripMargin,

    "q_reciprocal_links" ->
      s"""WITH e AS ($dkHostEdges),
         |r AS (
         |  SELECT e.src, e.dst, CASE WHEN x.src IS NOT NULL THEN 1 END AS m
         |  FROM e LEFT JOIN e x ON x.src = e.dst AND x.dst = e.src)
         |SELECT src AS host, count(*)::BIGINT AS out_deg, count(m)::BIGINT AS n_recip,
         |  (count(m) * 1000000 // count(*))::BIGINT AS recip_ppm,
         |  (count(m) * 1000000 // count(*)) >= 500000 AS link_farm_flag
         |FROM r GROUP BY 1""".stripMargin)
}
