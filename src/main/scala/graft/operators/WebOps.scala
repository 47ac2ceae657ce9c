package graft.operators

import graft.functions.TextKernels._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-crawl-side operators — the steps that run BEFORE the corpus ever
  * reaches the dedup/quality/curation stages already in the catalog: crawl
  * permission (robots longest-prefix match), link-graph anchor-text
  * aggregation (the classic relevance signal next to `q_host_pagerank`),
  * mirror-site detection (host-pair content containment), host-level
  * boilerplate line removal (the CCNet §4.1 cross-document line dedup,
  * scoped per host, fractional threshold), and blocked delta-encoded
  * inverted-index construction (the build side of `text_bm25_topk`'s
  * query-time probe).
  *
  * Scale design notes:
  *  - robots rules are a per-host policy table, tiny by nature → BROADCAST;
  *    per-URL evaluation is a narrow scan + windowed argmax over the ≤
  *    rules-per-host matched candidates (never a shuffle of the URL set);
  *  - anchor aggregation shuffles (target, term) count pairs with map-side
  *    partial aggregation — hot targets (every crawl has a src0) spread
  *    across their term space, and the top-k is a per-target window, not a
  *    global sort;
  *  - mirror detection joins host content-SETS on content hash: pair rows
  *    are generated only for hashes that actually co-occur, the join key is
  *    a hash (never text), and per-hash fanout is bounded by the number of
  *    hosts carrying that hash (a replicated boilerplate page is the hot
  *    case — the same cap/salting toolkit as the dedup family applies);
  *  - host-boilerplate counts shuffle (source, line-hash) pairs; document
  *    text moves exactly once, in the final doc_id-keyed rebuild join (the
  *    `text_substr_dedup` discipline);
  *  - the inverted index is sharded by doc range FIRST (`ShardSpan` docs
  *    per shard) so posting-list assembly windows over (term, shard) —
  *    bounded rows per partition key — never a single task per hot term;
  *    within a shard, postings are split into [[BlockSize]]-entry blocks
  *    whose deltas restart at each block head (every block independently
  *    decodable — the skip-pointer property real index formats need).
  *    Terms ride the shuffle as strings here for oracle transparency; a
  *    production build dictionary-encodes term → int64 first (same plan,
  *    narrower key).
  */
object WebOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Inverted-index geometry: docs per index shard / postings per block.
    * Sized so the sf corpora (500 docs, ids 0..499) exercise 4 shards and
    * up to 4 blocks per (term, shard); production scales ShardSpan to the
    * shard-file size and keeps the same invariants. */
  private val ShardSpan = 128L
  private val BlockSize = 32

  /** Mirror-detection fanout cap: a content hash shared by h hosts mints
    * h² pair rows through the self-join (an error-page or licence-page
    * hash carried by every host in a 10⁹-host crawl is the degenerate
    * case). Deterministic row_number cap per hash — first MaxHostsPerHash
    * hosts by name — mirrored in the oracle; same discipline as
    * FrontierOps.MaxNeighbors and the LSH MaxBandGroup caps. Host-set
    * sizes (na/nb) stay exact, computed pre-cap. */
  private val MaxHostsPerHash = 256L

  /** Host-boilerplate threshold: a line is boilerplate on its host when it
    * appears in ≥ 60% of the host's docs (strictly majority-plus — a 50%
    * rule would let a line shared by 1 of 2 docs strip both). */
  private val BoilerPct = 60L

  /** HITS fixed-point scale (score 1.0 ≡ [[HitsScale]] after each
    * max-normalization — same integer-lattice discipline as PageRank's
    * PrScale). Headroom: raw half-step sums are ≤ HitsScale·Σw =
    * 1e6·|docs|, and the normalizing multiply adds another 1e6 ⇒ safe to
    * ~9e6 docs per graph partition at int64; a 10^12-doc run normalizes
    * with a wider div first (same plan, one extra constant). */
  private val HitsScale = 1000000L

  /** Synthesized-line width in tokens (the sf corpus has no newlines —
    * same convention as TextOps' repetition rules). */
  private val LineW = 8

  /** Robots policy table (host index 0..6, path prefix, allow) — the
    * deterministic stand-in for per-host robots.txt fetches. Even hosts
    * carve an allow-exception inside the denied /private tree, which is
    * exactly the case longest-prefix-match exists for. One Scala value
    * builds BOTH the Spark literal frame and the oracle VALUES list. */
  private[operators] val RobotsRules: Seq[(Int, String, Boolean)] =
    (0 until 7).flatMap { h =>
      Seq((h, "/", true), (h, "/private", false), (h, "/cart", false)) ++
        (if (h % 2 == 0) Seq((h, "/private/open", true)) else Nil)
    }

  /** The 8-token host boilerplate header planted on every doc (host-specific
    * via `source`), so the fractional rule has a true positive per host. */
  private def hostHeader = concat(
    lit("site nav menu links copyright "), col("source"), lit(" home about "))

  /** The `q_host_pagerank` link rotation (same edge model — one doc links
    * its source host to a rotated target, every 3rd doc links to the hub
    * src0), reused here as the anchor-text edge set. */
  private[graft] def linkTarget = {
    val idx = substring(col("source"), 4, 6).cast("int")
    val rot = concat(lit("src"),
      ((idx + 1 + (col("doc_id") % 19).cast("int")) % 20).cast("string"))
    when(col("doc_id") % 3 === 0 && col("source") =!= "src0", lit("src0"))
      .otherwise(rot)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Robots longest-prefix-match crawl filter: per URL, the most specific
    // matching rule decides; ties break allow-first (the documented
    // least-restrictive robots convention), then prefix for determinism.
    // URL paths are synthesized per doc (5 variants incl. the /private/open
    // exception path); the rules table is broadcast.
    "q_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val rules = RobotsRules.toDF("h", "prefix", "allow")
      val pid   = (col("doc_id") % 200L).cast("string")
      val v     = col("doc_id") % 5L
      val path = when(v === 0, concat(lit("/page/"), pid))
        .when(v === 1, concat(lit("/private/doc"), pid))
        .when(v === 2, concat(lit("/private/open/doc"), pid))
        .when(v === 3, concat(lit("/cart/item"), pid))
        .otherwise(lit("/"))
      val urls = docs(s, dir).select(col("doc_id"),
        (col("doc_id") % 7L).cast("int").as("h"), path.as("path"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(length(col("prefix")).desc, col("allow").desc, col("prefix"))
      urls.join(broadcast(rules), Seq("h"))
        .filter(col("path").startsWith(col("prefix")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("doc_id"), concat(lit("host"), col("h").cast("string")).as("host"),
          col("path"), col("prefix").as("matched_rule"), col("allow").as("allowed"))
    }),

    // Anchor-text aggregation: each doc contributes its first 3 tokens as
    // the anchor phrase of one outgoing link (the linkTarget edge model);
    // per target host, the top-3 anchor terms by count (count desc, term
    // asc) — the inbound-anchor relevance signal search/quality rankers
    // consume alongside PageRank.
    "q_anchor_text" -> ((s, dir) => {
      val terms = docs(s, dir)
        .select(linkTarget.as("target"), explode(slice(tokens(col("text")), 1, 3)).as("term"))
      val cnt = terms.groupBy(col("target"), col("term")).agg(count(lit(1)).as("cnt"))
      val w   = Window.partitionBy(col("target")).orderBy(col("cnt").desc, col("term"))
      cnt.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
    }),

    // Mirror-host detection: hosts = sources, plus a planted full mirror of
    // src3 and a half-"spun" copy of src6 (every other src6 doc edited —
    // src6 ids are ≡ 6 (mod 20), so the spin keys on mod 40 to actually
    // split them). A host pair is a mirror when the shared content-hash
    // set covers ≥ 80% of the smaller host's set (containment, so a strict
    // subset mirror is still flagged); pairs sharing < 2 docs are noise and
    // dropped. Integer-scaled comparison — no float surface.
    "q_mirror_hosts" -> ((s, dir) => {
      val d = docs(s, dir).select(col("source").as("host"), md5(col("text")).as("ch"))
      val mirror = docs(s, dir).filter(col("source") === "src3")
        .select(lit("src3-mirror").as("host"), md5(col("text")).as("ch"))
      val spun = docs(s, dir).filter(col("source") === "src6")
        .select(lit("src6-spun").as("host"),
          md5(when(col("doc_id") % 40 === 6, concat(col("text"), lit(" spun edit")))
            .otherwise(col("text"))).as("ch"))
      val corpus = d.unionByName(mirror).unionByName(spun)
        .select(col("host"), col("ch")).distinct()
      val sizes  = corpus.groupBy(col("host")).agg(count(lit(1)).as("n"))
      val capped = FrontierOps.capPerKey(corpus, "ch", "host", MaxHostsPerHash)
      val pairs = capped.select(col("host").as("host_a"), col("ch"))
        .join(capped.select(col("host").as("host_b"), col("ch")), Seq("ch"))
        .filter(col("host_a") < col("host_b"))
        .groupBy(col("host_a"), col("host_b"))
        .agg(count(lit(1)).as("shared"))
      pairs
        .join(sizes.withColumnRenamed("host", "host_a").withColumnRenamed("n", "na"), Seq("host_a"))
        .join(sizes.withColumnRenamed("host", "host_b").withColumnRenamed("n", "nb"), Seq("host_b"))
        .filter(col("shared") >= 2)
        .select(col("host_a"), col("host_b"), col("shared"), col("na"), col("nb"),
          (col("shared") * 100 >= least(col("na"), col("nb")) * 80).as("is_mirror"))
    }),

    // Host-level boilerplate line removal (CCNet-style cross-document line
    // dedup, host-scoped): lines are LineW(8)-token windows; a line present
    // in ≥ BoilerPct% of its host's docs is stripped from ALL of them
    // (boilerplate has no "first owner" — contrast text_substr_dedup's
    // keep-first rule). A host-specific 8-token header is planted on every
    // doc so each host has a true positive. Line counts shuffle as (source,
    // md5(line)); text moves once in the doc_id-keyed rebuild.
    "text_host_boilerplate" -> ((s, dir) => {
      val withToks = Par.fanOut(docs(s, dir)).select(col("doc_id"), col("source"),
        tokens(concat(hostHeader, col("text"))).as("toks"))
      val nln = floor((size(col("toks")) + LineW - 1) / LineW).cast("int")
      val withLines = withToks.select(col("doc_id"), col("source"),
        transform(sequence(lit(0), nln - 1), i =>
          array_join(slice(col("toks"), i * LineW + 1, lit(LineW)), " ")).as("lines"))
      val occ = withLines
        .select(col("doc_id"), col("source"), posexplode(col("lines")))
        .select(col("doc_id"), col("source"), col("pos"), md5(col("col")).as("lh"))
      val nd = occ.groupBy(col("source"), col("lh"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      val nh = docs(s, dir).groupBy(col("source")).agg(count(lit(1)).as("nh"))
      val boiler = nd.join(nh, Seq("source"))
        .filter(col("nd") * 100 >= col("nh") * BoilerPct)
        .select(col("source"), col("lh"))
      val keep = occ.join(boiler, Seq("source", "lh"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("pos"))).as("keep_pos"),
          count(lit(1)).as("kept_lines"))
      withLines.join(keep, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          size(col("lines")).cast("long").as("n_lines"),
          coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
          array_join(transform(coalesce(col("keep_pos"), array().cast("array<int>")),
            p => element_at(col("lines"), p + 1)), " ").as("cleaned"))
    }),

    // WARC-style record parse: each doc round-trips through a synthesized
    // crawl-archive record (version line, target-URI header,
    // Content-Length header, blank line, body) and is parsed back by line
    // splitting + positional substr — the ingestion-format parity check
    // for the fetch→extract boundary. intact pins version, body equality
    // and the declared length in one flag; a corrupt record degrades to
    // intact=false identically on both engines. Narrow per-row scan.
    "q_warc_parse" -> ((s, dir) => {
      val rec = concat(lit("WARC/1.0\n"),
        lit("WARC-Target-URI: http://"), col("source"), lit("/doc/"),
        col("doc_id").cast("string"), lit("\n"),
        lit("Content-Length: "), length(col("text")).cast("string"), lit("\n\n"),
        col("text"))
      val parsedLen = expr("CAST(substr(element_at(lines, 3), 17) AS BIGINT)")
      docs(s, dir).select(col("doc_id"), col("text"), split(rec, "\n").as("lines"))
        .select(col("doc_id"),
          expr("substr(element_at(lines, 2), 18)").as("uri"),
          parsedLen.as("content_length"),
          length(element_at(col("lines"), 5)).cast("long").as("body_chars"),
          (element_at(col("lines"), 1) === "WARC/1.0" &&
            element_at(col("lines"), 5) === col("text") &&
            parsedLen === length(element_at(col("lines"), 5)).cast("long"))
            .as("intact"))
    }),

    // Blocked delta-encoded inverted-index build: per (term, shard), the
    // doc-sorted posting list split into BlockSize-entry blocks, each block
    // head absolute and the rest gap-encoded; df/cf are global per term.
    "search_postings" -> ((s, dir) => {
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .withColumn("shard", expr(s"doc_id div $ShardSpan"))
      val stats = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      val wOrd = Window.partitionBy(col("term"), col("shard")).orderBy(col("doc_id"))
      val e = tf.withColumn("rn", row_number().over(wOrd))
        .withColumn("prev", lag(col("doc_id"), 1).over(wOrd))
        .withColumn("block_id", expr(s"(rn - 1) div $BlockSize").cast("long"))
        .withColumn("gap",
          when((col("rn") - 1) % BlockSize === 0, col("doc_id"))
            .otherwise(col("doc_id") - col("prev")))
      e.groupBy(col("term"), col("shard"), col("block_id"))
        .agg(count(lit(1)).as("block_n"),
          array_join(transform(array_sort(collect_list(struct(col("doc_id"), col("gap")))),
            x => x.getField("gap").cast("string")), ",").as("gaps"))
        .join(stats, Seq("term"))
        .select(col("term"), col("shard"), col("block_id"), col("df"), col("cf"),
          col("block_n"), col("gaps"))
    }),

    // Redirect-chain resolution by pointer DOUBLING: every URL carries a
    // redirect pointer (synthesized functional graph — ids at multiples
    // of 50 are terminals pointing at themselves, everything else points
    // at id−1, so chains run up to 49 hops), and each round composes the
    // pointer map with ITSELF (f ← f∘f), so a chain of length L resolves
    // in ⌈log2 L⌉ = RedirectRounds rounds instead of L sequential steps —
    // the Wyllie pointer-jumping move the CC operator uses for cluster
    // labels, applied to the functional graph every crawler maintains
    // for 3xx chains / URL aliases / rel=canonical links. Each round is
    // ONE self equi-join of an (id, ptr, hops) longs frame; terminals
    // compose as fixpoints (ptr = u, hops 0) so converged rows ride
    // through unchanged. Lineage is truncated each round
    // (localCheckpoint — the plan would otherwise reference itself twice
    // per round, 2^rounds leaves; the HITS lesson) and the previous
    // round's blocks are freed eagerly; only the final round's tiny
    // (3 longs/url) blocks outlive the query. The oracle walks the SAME
    // chains ONE hop at a time via a recursive CTE — an independent
    // O(L)-step method agreeing with the O(log L) one.
    "q_redirect_resolve" -> ((s, dir) => {
      var f = docs(s, dir).select(col("doc_id").as("u"))
        .withColumn("p",
          when(col("u") % 50 === 0, col("u")).otherwise(col("u") - 1))
        .withColumn("hops",
          when(col("p") === col("u"), lit(0L)).otherwise(lit(1L)))
      var prevBlocks: Option[org.apache.spark.rdd.RDD[_]] = None
      (1 to RedirectRounds).foreach { _ =>
        val next = f.as("l").join(f.as("r"), col("l.p") === col("r.u"))
          .select(col("l.u").as("u"), col("r.p").as("p"),
            (col("l.hops") + col("r.hops")).as("hops"))
          .localCheckpoint()
        val blocks = next.queryExecution.analyzed.collectFirst {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
        }
        prevBlocks.foreach(_.unpersist(blocking = false))
        prevBlocks = blocks
        f = next
      }
      f.select(col("u").as("url_id"), col("p").as("terminal_id"), col("hops"))
    }),

    // HITS (Kleinberg 1999, "Authoritative sources in a hyperlinked
    // environment") — the hub/authority DUAL to q_host_pagerank's single
    // score, over the same synthesized host multigraph: authorities are
    // hosts good hubs point AT (auth(v) = Σ_{u→v} hub(u)·w), hubs are
    // hosts that point at good authorities (hub(u) = Σ_{u→v} auth(v)·w).
    // Two mutual-reinforcement iterations (4 half-steps) unrolled in
    // EXACT int64 arithmetic: each half-step is a weighted sum over the
    // edge list followed by max-normalization r ← (r·SCALE) div max(r) —
    // max is order-independent and div exact, so the whole fixpoint
    // prefix is hash-exact cross-engine (the PageRank/k-means rule; the
    // classic L2 normalization would drift in float summation order).
    // Scale shape: the graph is the groupBy(u,v) count edge list
    // (map-side partial agg — 10^12 links collapse to host-pair
    // cardinality before shuffling); each half-step is one broadcast
    // score-table join + one (host, int64) aggregate, the normalizing
    // max is a 1-row agg crossJoined back, and the four unrolled levels
    // share the edge aggregation via ReuseExchange (one docs scan at
    // runtime despite the nested plan). Shuffles carry (host, int64)
    // only — the CC-iteration discipline.
    "q_hits" -> ((s, dir) => {
      val e = docs(s, dir).select(col("source").as("u"), linkTarget.as("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      val hosts = e.select(col("u").as("host"))
        .unionByName(e.select(col("v").as("host"))).distinct()
      def normalize(r: DataFrame): DataFrame = {
        val m = r.agg(max(col("r")).as("m"))
        r.crossJoin(broadcast(m))
          .select(col("host"), expr(s"(r * $HitsScale) div m").as("r"))
      }
      def halfStep(score: DataFrame, from: String, to: String): DataFrame =
        normalize(hosts.join(
          e.join(broadcast(score.withColumnRenamed("host", from)), Seq(from))
            .groupBy(col(to)).agg(sum(col("r") * col("w")).as("s"))
            .select(col(to).as("host"), col("s").as("r")),
          Seq("host"), "left")
          .select(col("host"), coalesce(col("r"), lit(0L)).as("r")))
      def authStep(hub: DataFrame)  = halfStep(hub, "u", "v")
      def hubStep(auth: DataFrame)  = halfStep(auth, "v", "u")
      // each level is CACHED: level k feeds level k+1 AND the final join,
      // so uncached the auth1 subtree re-evaluates 4× (and each re-run is
      // a chain of sequential broadcast jobs — measured 7.1 s for a
      // host-sized graph; the scores are |hosts| rows, the canonical
      // driver-shaped data a production run would collect to literals)
      val auth1 = authStep(hosts.withColumn("r", lit(HitsScale))).cache()
      val hub1  = hubStep(auth1).cache()
      val auth2 = authStep(hub1).cache()
      val hub2  = hubStep(auth2)
      val wA = Window.orderBy(col("auth2").desc, col("host").asc)
      val wH = Window.orderBy(col("hub2").desc, col("host").asc)
      hosts
        .join(auth1.withColumnRenamed("r", "auth1"), Seq("host"))
        .join(hub1.withColumnRenamed("r", "hub1"), Seq("host"))
        .join(auth2.withColumnRenamed("r", "auth2"), Seq("host"))
        .join(hub2.withColumnRenamed("r", "hub2"), Seq("host"))
        .withColumn("auth_rank", dense_rank().over(wA).cast("long"))
        .withColumn("hub_rank", dense_rank().over(wH).cast("long"))
    }))

  /** q_redirect_resolve: doubling rounds — 2^6 = 64 ≥ the 49-hop max
    * chain the synthesized pointer map contains. */
  private val RedirectRounds = 6

  // --- DuckDB oracles -------------------------------------------------------

  private def dkRobotsValues: String =
    RobotsRules.map { case (h, p, a) => s"($h, '$p', $a)" }.mkString(", ")

  private[operators] val dkLinkTarget =
    s"""CASE WHEN doc_id % 3 = 0 AND source <> 'src0' THEN 'src0'
       |  ELSE 'src' ||
       |    ((CAST(substr(source, 4) AS INT) + 1 + (doc_id % 19)::INT) % 20)::VARCHAR
       |END""".stripMargin

  val oracles: Map[String, String] = Map(
    // Four unrolled half-steps; values are nonnegative throughout so
    // DuckDB's truncating // equals floor equals Spark's div.
    "q_hits" ->
      s"""WITH e AS (
         |  SELECT source AS u, $dkLinkTarget AS v, count(*)::BIGINT AS w
         |  FROM documents GROUP BY 1, 2),
         |h AS (SELECT u AS host FROM e UNION SELECT v FROM e),
         |a1r AS (SELECT h.host, coalesce(s, 0)::BIGINT AS r FROM h LEFT JOIN
         |  (SELECT v AS host, sum($HitsScale * w) AS s FROM e GROUP BY 1) x USING (host)),
         |a1 AS (SELECT host,
         |  ((r * $HitsScale) // (SELECT max(r) FROM a1r))::BIGINT AS r FROM a1r),
         |h1r AS (SELECT h.host, coalesce(s, 0)::BIGINT AS r FROM h LEFT JOIN
         |  (SELECT e.u AS host, sum(a1.r * e.w) AS s
         |   FROM e JOIN a1 ON a1.host = e.v GROUP BY 1) x USING (host)),
         |h1 AS (SELECT host,
         |  ((r * $HitsScale) // (SELECT max(r) FROM h1r))::BIGINT AS r FROM h1r),
         |a2r AS (SELECT h.host, coalesce(s, 0)::BIGINT AS r FROM h LEFT JOIN
         |  (SELECT e.v AS host, sum(h1.r * e.w) AS s
         |   FROM e JOIN h1 ON h1.host = e.u GROUP BY 1) x USING (host)),
         |a2 AS (SELECT host,
         |  ((r * $HitsScale) // (SELECT max(r) FROM a2r))::BIGINT AS r FROM a2r),
         |h2r AS (SELECT h.host, coalesce(s, 0)::BIGINT AS r FROM h LEFT JOIN
         |  (SELECT e.u AS host, sum(a2.r * e.w) AS s
         |   FROM e JOIN a2 ON a2.host = e.v GROUP BY 1) x USING (host)),
         |h2 AS (SELECT host,
         |  ((r * $HitsScale) // (SELECT max(r) FROM h2r))::BIGINT AS r FROM h2r)
         |SELECT h.host, a1.r AS auth1, h1.r AS hub1, a2.r AS auth2, h2.r AS hub2,
         |  dense_rank() OVER (ORDER BY a2.r DESC, h.host ASC)::BIGINT AS auth_rank,
         |  dense_rank() OVER (ORDER BY h2.r DESC, h.host ASC)::BIGINT AS hub_rank
         |FROM h
         |JOIN a1 ON a1.host = h.host JOIN h1 ON h1.host = h.host
         |JOIN a2 ON a2.host = h.host JOIN h2 ON h2.host = h.host""".stripMargin,

    "q_redirect_resolve" ->
      """WITH RECURSIVE base AS (
        |  SELECT doc_id AS u,
        |    CASE WHEN doc_id % 50 = 0 THEN doc_id ELSE doc_id - 1 END AS p
        |  FROM documents),
        |walk AS (
        |  SELECT u, p AS cur,
        |    (CASE WHEN p = u THEN 0 ELSE 1 END)::BIGINT AS hops
        |  FROM base
        |  UNION ALL
        |  SELECT w.u, b.p AS cur, w.hops + 1
        |  FROM walk w JOIN base b ON b.u = w.cur
        |  WHERE b.p <> w.cur)
        |SELECT u AS url_id, arg_max(cur, hops) AS terminal_id,
        |  max(hops)::BIGINT AS hops
        |FROM walk GROUP BY 1""".stripMargin,

    "q_robots_filter" ->
      s"""WITH r(h, prefix, allow) AS (VALUES $dkRobotsValues),
         |u AS (
         |  SELECT doc_id, (doc_id % 7)::INT AS h,
         |    CASE doc_id % 5
         |      WHEN 0 THEN '/page/' || (doc_id % 200)::VARCHAR
         |      WHEN 1 THEN '/private/doc' || (doc_id % 200)::VARCHAR
         |      WHEN 2 THEN '/private/open/doc' || (doc_id % 200)::VARCHAR
         |      WHEN 3 THEN '/cart/item' || (doc_id % 200)::VARCHAR
         |      ELSE '/' END AS path
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, h, path, prefix, allow,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY length(prefix) DESC, allow DESC, prefix) AS rk
         |  FROM u JOIN r USING (h)
         |  WHERE starts_with(path, prefix))
         |SELECT doc_id, 'host' || h::VARCHAR AS host, path,
         |  prefix AS matched_rule, allow AS allowed
         |FROM m WHERE rk = 1""".stripMargin,

    "q_anchor_text" ->
      s"""WITH e AS (
         |  SELECT $dkLinkTarget AS target,
         |    unnest((${Dk.tokens("text")})[1:3]) AS term
         |  FROM documents),
         |c AS (SELECT target, term, count(*)::BIGINT AS cnt FROM e GROUP BY 1, 2)
         |SELECT target, term, cnt, rank FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY target ORDER BY cnt DESC, term) AS rank
         |  FROM c) WHERE rank <= 3""".stripMargin,

    "q_mirror_hosts" ->
      s"""WITH c AS (
         |  SELECT source AS host, md5(text) AS ch FROM documents
         |  UNION ALL
         |  SELECT 'src3-mirror', md5(text) FROM documents WHERE source = 'src3'
         |  UNION ALL
         |  SELECT 'src6-spun',
         |    md5(CASE WHEN doc_id % 40 = 6 THEN text || ' spun edit' ELSE text END)
         |  FROM documents WHERE source = 'src6'),
         |dc AS (SELECT DISTINCT host, ch FROM c),
         |sz AS (SELECT host, count(*)::BIGINT AS n FROM dc GROUP BY 1),
         |capped AS (
         |  SELECT host, ch FROM (
         |    SELECT host, ch, row_number() OVER (PARTITION BY ch ORDER BY host) AS rn FROM dc)
         |  WHERE rn <= $MaxHostsPerHash),
         |p AS (
         |  SELECT a.host AS host_a, b.host AS host_b, count(*)::BIGINT AS shared
         |  FROM capped a JOIN capped b ON a.ch = b.ch AND a.host < b.host
         |  GROUP BY 1, 2)
         |SELECT host_a, host_b, shared, sa.n AS na, sb.n AS nb,
         |  shared * 100 >= least(sa.n, sb.n) * 80 AS is_mirror
         |FROM p JOIN sz sa ON p.host_a = sa.host JOIN sz sb ON p.host_b = sb.host
         |WHERE shared >= 2""".stripMargin,

    "text_host_boilerplate" ->
      s"""WITH h AS (
         |  SELECT doc_id, source,
         |    ${Dk.tokens("'site nav menu links copyright ' || source || ' home about ' || text")} AS toks
         |  FROM documents),
         |l AS (
         |  SELECT doc_id, source,
         |    [array_to_string(toks[(i*$LineW+1):(i*$LineW+$LineW)], ' ')
         |     for i in generate_series(0, (len(toks) + ${LineW - 1}) // $LineW - 1)] AS lines
         |  FROM h),
         |occ AS (
         |  SELECT doc_id, source,
         |    unnest([i for i in generate_series(0, len(lines) - 1)]) AS pos,
         |    unnest([md5(x) for x in lines]) AS lh
         |  FROM l),
         |nd AS (SELECT source, lh, count(DISTINCT doc_id)::BIGINT AS nd FROM occ GROUP BY 1, 2),
         |nh AS (SELECT source, count(*)::BIGINT AS nh FROM documents GROUP BY 1),
         |b AS (SELECT source, lh FROM nd JOIN nh USING (source)
         |  WHERE nd * 100 >= nh * $BoilerPct),
         |kp AS (
         |  SELECT doc_id, list_sort(list(pos)) AS keep_pos, count(*)::BIGINT AS kept_lines
         |  FROM occ o
         |  WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.source = o.source AND b.lh = o.lh)
         |  GROUP BY 1)
         |SELECT l.doc_id, l.source, len(lines)::BIGINT AS n_lines,
         |  coalesce(kept_lines, 0)::BIGINT AS kept_lines,
         |  coalesce(array_to_string(
         |    [lines[p+1] for p in coalesce(keep_pos, []::BIGINT[])], ' '), '') AS cleaned
         |FROM l LEFT JOIN kp ON l.doc_id = kp.doc_id""".stripMargin,

    "q_warc_parse" ->
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    'WARC/1.0' || chr(10) ||
         |    'WARC-Target-URI: http://' || source || '/doc/' || doc_id::VARCHAR || chr(10) ||
         |    'Content-Length: ' || length(text)::VARCHAR || chr(10) || chr(10) || text AS rec
         |  FROM documents),
         |p AS (SELECT doc_id, text, string_split(rec, chr(10)) AS lines FROM r)
         |SELECT doc_id,
         |  substr(lines[2], 18) AS uri,
         |  CAST(substr(lines[3], 17) AS BIGINT) AS content_length,
         |  length(lines[5])::BIGINT AS body_chars,
         |  (lines[1] = 'WARC/1.0' AND lines[5] = text
         |   AND CAST(substr(lines[3], 17) AS BIGINT) = length(lines[5])) AS intact
         |FROM p""".stripMargin,

    "search_postings" ->
      s"""WITH t AS (SELECT doc_id, ${Dk.tokens("text")} AS toks FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*)::BIGINT AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
         |st AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1),
         |e AS (
         |  SELECT doc_id, term, doc_id // $ShardSpan AS shard,
         |    row_number() OVER w AS rn, lag(doc_id) OVER w AS prev
         |  FROM tf WINDOW w AS (PARTITION BY term, doc_id // $ShardSpan ORDER BY doc_id)),
         |g AS (
         |  SELECT term, shard, (rn - 1) // $BlockSize AS block_id, doc_id,
         |    CASE WHEN (rn - 1) % $BlockSize = 0 THEN doc_id ELSE doc_id - prev END AS gap
         |  FROM e)
         |SELECT term, shard::BIGINT AS shard, block_id::BIGINT AS block_id, df, cf,
         |  count(*)::BIGINT AS block_n,
         |  array_to_string(list(gap::VARCHAR ORDER BY doc_id), ',') AS gaps
         |FROM g JOIN st USING (term)
         |GROUP BY 1, 2, 3, 4, 5""".stripMargin)
}
