package graft.operators

import graft.functions.TextKernels.{hex32, hex32Of, tokens, Dk}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable-sketch and deterministic-sampling operators — the
  * "count/sample a 100 TB column without moving it" family. Algorithms
  * are the published classics — HyperLogLog (Flajolet, Fusy, Gandouet,
  * Meunier 2007), count-min sketch (Cormode & Muthukrishnan 2005) — built
  * on this repo's portable md5-derived hashing so every register/counter
  * is bit-exact across engines.
  *
  *  - **HyperLogLog (p=9, m=512 registers)**, built DETERMINISTICALLY on
  *    the portable md5-derived 32-bit hash so the whole sketch is
  *    oracle-checkable bit-for-bit (stock `approx_count_distinct` is HLL++
  *    with engine-private hashing — same idea, unverifiable across
  *    engines). Register index = low 9 hash bits, rho = leading zeros of
  *    the remaining 23 bits + 1. The physical shape is THE distributed
  *    sketch story: a map-side partial `max` per register, then a 512-row
  *    shuffle regardless of input size; merging two sketches is the same
  *    `max` — associative, commutative, idempotent.
  *    The estimator output stays transcendental-free (no ln/log in hashed
  *    columns): the register sum is kept in integer space as
  *    Σ 2^(24−rho) ≤ 2^33 (exact BIGINT both engines; the float sum of
  *    2^-rho terms would be order-dependent, and DuckDB's double→DECIMAL
  *    cast at scale 28 is itself inexact — measured), and the final
  *    alpha·m²/Σ division is a fixed IEEE expression on identical doubles.
  *
  *  - **Stratified sampling** as a stateless, shuffle-free filter: the
  *    keep decision is a salted hash threshold, with a per-stratum rate
  *    itself derived from the stratum name's hash — no `rand()` (non-
  *    reproducible under retries/speculation: a re-run task would sample
  *    different rows), no per-stratum config table, no driver round-trip.
  *    The exact sample membership is the hashed oracle output.
  */
object Sketches {

  /** q_reservoir_sample: per-stratum sample size and prefilter factor
    * (threshold keeps ~Pre·k expected survivors). */
  private val ReservoirK   = 8L
  private val ReservoirPre = 8L

  /** registers = 2^P */
  val P = 9
  val M = 1 << P // 512
  /** remaining hash bits after the register index */
  val WBits = 32 - P // 23

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The sketch itself: one row per hit register, rho = max over hashes.
    * conv(_, 10, 2) gives the minimal binary string, so bit-length =
    * string length; rho = WBits − bitlen + 1, and the all-zero remainder
    * maps to WBits + 1 = 24. */
  /** Sketch-build over any frame with the hashed key column — exposed so
    * the mergeability property (sketch(full) == max-merge of sketches of
    * disjoint splits) is testable on the same code path. */
  private[graft] def registersOf(ev: DataFrame): DataFrame =
    ev
      .select(hex32(concat(col("user_id").cast("string"), lit("|"), col("props"))).as("h"))
      .select((col("h") % M).as("reg"), expr(s"h DIV $M").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(WBits + 1).cast("long"))
          .otherwise(lit(WBits + 1) - length(conv(col("w").cast("string"), 10, 2))).cast("long"))
      .groupBy(col("reg"))
      .agg(max(col("rho")).as("rho"))

  private def registers(s: SparkSession, dir: String): DataFrame =
    registersOf(t(s, dir, "events"))

  /** Per-day register sets: same rho rule, keyed by (day_key, reg). */
  private def registersByDay(ev: DataFrame): DataFrame =
    ev
      .select(col("day_key"),
        hex32(concat(col("user_id").cast("string"), lit("|"), col("props"))).as("h"))
      .select(col("day_key"), (col("h") % M).as("reg"), expr(s"h DIV $M").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(WBits + 1).cast("long"))
          .otherwise(lit(WBits + 1) - length(conv(col("w").cast("string"), 10, 2))).cast("long"))
      .groupBy(col("day_key"), col("reg"))
      .agg(max(col("rho")).as("rho"))

  /** [[estimateOf]] plus the Flajolet–Fusy–Gandouet–Meunier small-range
    * correction: below raw ≤ 2.5m with empty registers present, LINEAR
    * COUNTING m·ln(m/v_zero) replaces the raw estimate (which overreads
    * badly in that regime — the catalog's other HLL queries expose
    * v_zero and leave the switch to the consumer; the intersect query IS
    * such a consumer, and inclusion–exclusion of three overread raws
    * compounds the bias). The branch condition uses the already-4dp-
    * rounded raw, so both engines take the same arm; the `ln` is the one
    * float-library call in the catalog — safe under 4dp rounding on
    * deterministic inputs (≤1 ulp libm-vs-JVM drift vs a 5e-5 grid). */
  private[graft] def estimateCorrected(regs: DataFrame, keys: Seq[String]): DataFrame =
    estimateOf(regs, keys)
      .withColumn("estimate",
        when(col("v_zero") > 0 && col("raw_estimate") <= lit(2.5 * M),
          round(lit(M.toDouble) * log(lit(M.toDouble) / col("v_zero")), 4))
          .otherwise(col("raw_estimate")))

  /** The raw HLL estimator per key group of a (keys…, reg, rho) frame —
    * same integer-space sum rule as [[queries]]' global estimate. */
  private[graft] def estimateOf(regs: DataFrame, keys: Seq[String] = Seq("day_key")): DataFrame = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))
    val scale = lit((1L << (WBits + 1)).toDouble)
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("m_hit"),
        sum(pow(lit(2.0), lit(WBits + 1) - col("rho")).cast("long")).as("hit_sum"))
      .withColumn("v_zero", lit(M.toLong) - col("m_hit"))
      .withColumn("sum_inv",
        (col("hit_sum") + col("v_zero") * (1L << (WBits + 1))).cast("double") / scale)
      .withColumn("raw_estimate",
        round(alpha * lit(M.toDouble) * lit(M.toDouble) / col("sum_inv"), 4))
      .select(keys.map(col) ++ Seq(col("m_hit").cast("long").as("m_hit"),
        col("v_zero"), col("raw_estimate")): _*)
  }

  /** CMS geometry: CmsD hash rows × CmsW counters. Error bound: est −
    * exact ≤ e/CmsW · N with prob 1 − e^−CmsD. */
  val CmsD = 4
  val CmsW = 1024

  private def docTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(explode(tokens(col("text"))).as("tok"))

  /** The CmsD (row, counter-index) targets of one md5 digest column —
    * rows draw disjoint 8-hex windows of the same 32-hex digest, so one
    * digest pass feeds all rows (the simhash/minhash digest-reuse rule). */
  private[graft] def cmsRowIdx(dg: org.apache.spark.sql.Column) =
    array((0 until CmsD).map { j =>
      struct(lit(j.toLong).as("row_j"), (hex32Of(dg, 1 + 8 * j) % CmsW).as("idx"))
    }: _*)

  private[graft] def cmsCounters(s: SparkSession, dir: String): DataFrame =
    docTokens(s, dir)
      .withColumn("dg", md5(col("tok")))
      .select(explode(cmsRowIdx(col("dg"))).as("ri"))
      .groupBy(col("ri.row_j").as("row_j"), col("ri.idx").as("idx"))
      .agg(count(lit(1)).as("cnt"))

  /** Order values as exact integer cents ≥ 1 (the histogram's domain).
    * round() not floor(): the true value is exact cents, the double
    * product sits within 1e-9 of it, and positive-value HALF_UP ==
    * half-away, so both engines land on the same integer. */
  private def orderCents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(round(col("l_extendedprice") * 100, 0).cast("long").as("v"))

  /** Two-leading-digits log-ish binning: mag = decimal digits of v,
    * lead = first one/two digits, bin spans [lead·10^p, (lead+1)·10^p).
    * String/integer ops only — `length(v::string)` is the exact decimal
    * magnitude, DIV is exact integer division in both engines. */
  private def quantileBins(s: SparkSession, dir: String): DataFrame =
    orderCents(s, dir)
      .withColumn("mag", length(col("v").cast("string")).cast("long"))
      .withColumn("p", greatest(col("mag") - 2, lit(0L)))
      .withColumn("tens", pow(lit(10.0), col("p")).cast("long"))
      .withColumn("lead", expr("v DIV tens"))
      .groupBy((col("mag") * 100 + col("lead")).as("bin_id"),
        (col("lead") * col("tens")).as("lo_cents"),
        ((col("lead") + 1) * col("tens")).as("hi_cents"))
      .agg(count(lit(1)).as("cnt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll_registers" -> ((s, dir) => registers(s, dir)),

    // Distribution-drift monitor (the PSI-style data-quality gate a
    // continuously-ingesting corpus runs between time slices, kept
    // INTEGER-EXACT instead of transcendental so both engines agree
    // bit-for-bit): split the event stream at the midpoint day, compare
    // each event_type's rate between the halves in ppm, flag drift above
    // 2%. Scale shape: category counts are one partial-agg pass (the
    // shuffle carries (type, half, count) rows — category-cardinality,
    // not events), the half totals are a broadcast-sized frame, and the
    // midpoint comes from the same 1-row min/max aggregate discipline as
    // q_snapshot_expire's head. abs() of an integer difference, no
    // doubles anywhere.
    "q_distribution_drift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("day", expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"))
      val mid = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        .select(expr("(mn + mx + 1) DIV 2").as("mid_day"))
      val halves = ev.join(broadcast(mid))
        .withColumn("half", when(col("day") < col("mid_day"), "base").otherwise("current"))
        .groupBy(col("event_type"), col("half")).agg(count(lit(1)).as("n"))
      val tot = halves.groupBy(col("half")).agg(sum(col("n")).as("tot"))
      val ppm = halves.join(broadcast(tot), Seq("half"))
        .withColumn("ppm", expr("n * 1000000 DIV tot"))
      val base = ppm.filter(col("half") === "base")
        .select(col("event_type"), col("n").as("n_base"), col("ppm").as("ppm_base"))
      val cur = ppm.filter(col("half") === "current")
        .select(col("event_type"), col("n").as("n_current"), col("ppm").as("ppm_current"))
      base.join(cur, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          coalesce(col("n_base"), lit(0L)).as("n_base"),
          coalesce(col("n_current"), lit(0L)).as("n_current"),
          coalesce(col("ppm_base"), lit(0L)).as("ppm_base"),
          coalesce(col("ppm_current"), lit(0L)).as("ppm_current"))
        .withColumn("drift_ppm", abs(col("ppm_current") - col("ppm_base")))
        .withColumn("drifted", col("drift_ppm") > 20000L)
    }),

    // Estimator + error observable vs the exact distinct count. raw
    // estimate = alpha_m * m^2 / Σ 2^-rho_j over ALL m registers; the sum
    // is carried as integers scaled by 2^24 (empty registers contribute
    // 2^24 = 2^0 scaled). v_zero is the linear-counting trigger a consumer
    // would use below E <= 2.5m; we expose it rather than apply the
    // ln-based correction so every hashed column stays engine-portable
    // (the sketched cardinality here — distinct (user, props) combos —
    // sits in the raw estimator's valid regime at the driver's sf).
    "sketch_hll_estimate" -> ((s, dir) => {
      val sums = registers(s, dir).agg(
        count(lit(1)).as("m_hit"),
        sum(pow(lit(2.0), lit(WBits + 1) - col("rho")).cast("long")).as("hit_sum"))
      val exact = t(s, dir, "events")
        .agg(countDistinct(concat(col("user_id").cast("string"), lit("|"), col("props")))
          .as("exact_distinct"))
      val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))
      val scale = lit((1L << (WBits + 1)).toDouble) // 2^24
      sums.crossJoin(exact)
        .withColumn("v_zero", lit(M.toLong) - col("m_hit"))
        .withColumn("sum_inv",
          (col("hit_sum") + col("v_zero") * (1L << (WBits + 1))).cast("double") / scale)
        .withColumn("raw_estimate",
          round(alpha * lit(M.toDouble) * lit(M.toDouble) / col("sum_inv"), 4))
        .select(
          col("m_hit").cast("long").as("m_hit"), col("v_zero"),
          col("raw_estimate"), col("exact_distinct"),
          round(col("raw_estimate") / col("exact_distinct"), 4).as("rel_to_exact"))
    }),

    // Windowed HLL rollup — the monitoring shape at 100 TB: one sketch
    // per day, plus the all-time total computed by MERGING the per-day
    // register sets (max per register). The oracle computes the total row
    // INDEPENDENTLY from the global hash stream, so the driver's hash
    // compare is itself the proof that merging day sketches loses nothing
    // — the equivalence that lets a real deployment keep only per-window
    // sketches and roll them up on demand. Per-day cardinalities sit in
    // the linear-counting regime at small sf (raw estimator overreads,
    // v_zero ≫ 0 is the consumer's LC trigger — documented at
    // [[queries]]' global estimate); the merged total is in-regime and
    // lands within the m=512 error bound.
    "sketch_hll_daily" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("day_key", expr("unix_micros(cast(ts AS timestamp)) DIV 86400000000"))
      val dayRegs = registersByDay(ev)
      val merged = dayRegs.groupBy(col("reg")).agg(max(col("rho")).as("rho"))
        .withColumn("day_key", lit(-1L))
      val exactDay = ev.groupBy(col("day_key"))
        .agg(countDistinct(concat(col("user_id").cast("string"), lit("|"), col("props")))
          .as("exact_distinct"))
      val exactAll = ev
        .agg(countDistinct(concat(col("user_id").cast("string"), lit("|"), col("props")))
          .as("exact_distinct"))
        .withColumn("day_key", lit(-1L))
      estimateOf(dayRegs.unionByName(merged.select(dayRegs.columns.toIndexedSeq.map(col): _*)))
        .join(exactDay.unionByName(exactAll.select(exactDay.columns.toIndexedSeq.map(col): _*)),
          Seq("day_key"))
        .withColumn("rel_to_exact", round(col("raw_estimate") / col("exact_distinct"), 4))
    }),

    // Set-overlap estimation by HLL inclusion–exclusion: for every pair
    // of event types, |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    // union sketch is the per-register MAX of the two sets' registers —
    // the merge property again, now answering a question (audience
    // overlap, cross-source entity overlap) that would otherwise need a
    // full distinct-join. Scale shape: per-type registers are ONE pass
    // over events ending in |types|·m rows; every pair estimate is
    // arithmetic over those tiny register sets (the pair frame is
    // broadcast); the exact intersection rides along as the observable —
    // an entity-keyed equi-join whose fanout per key is ≤ |types| —
    // so the estimator's error is measured, not trusted. Every estimate
    // goes through [[estimateCorrected]]'s linear-counting small-range
    // switch: inclusion–exclusion of three RAW estimates would compound
    // the LC-regime overread into nonsense at exactly the set sizes
    // where overlap questions get asked.
    "sketch_hll_intersect" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        concat(col("user_id").cast("string"), lit("|"), col("props")).as("key"))
      val regsT = ev.select(col("event_type"), hex32(col("key")).as("h"))
        .select(col("event_type"), (col("h") % M).as("reg"), expr(s"h DIV $M").as("w"))
        .withColumn("rho",
          when(col("w") === 0, lit(WBits + 1).cast("long"))
            .otherwise(lit(WBits + 1) - length(conv(col("w").cast("string"), 10, 2))).cast("long"))
        .groupBy(col("event_type"), col("reg")).agg(max(col("rho")).as("rho"))
      val types = regsT.select(col("event_type")).distinct()
      val pairs = types.as("a").join(types.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      val unionRegs = broadcast(pairs).join(regsT,
          col("event_type") === col("type_a") || col("event_type") === col("type_b"))
        .groupBy(col("type_a"), col("type_b"), col("reg")).agg(max(col("rho")).as("rho"))
      val estT = estimateCorrected(regsT, Seq("event_type"))
      val estU = estimateCorrected(unionRegs, Seq("type_a", "type_b"))
        .select(col("type_a"), col("type_b"), col("estimate").as("est_union"))
      val ents = ev.distinct()
      val exact = ents.as("a").join(ents.as("b"),
          col("a.key") === col("b.key") && col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("exact_intersect"))
      pairs
        .join(estT.select(col("event_type").as("type_a"), col("estimate").as("est_a")),
          Seq("type_a"))
        .join(estT.select(col("event_type").as("type_b"), col("estimate").as("est_b")),
          Seq("type_b"))
        .join(estU, Seq("type_a", "type_b"))
        .join(exact, Seq("type_a", "type_b"), "left_outer")
        .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
          col("est_union"),
          round(col("est_a") + col("est_b") - col("est_union"), 4).as("est_intersect"),
          coalesce(col("exact_intersect"), lit(0L)).as("exact_intersect"))
    }),

    // Count-min sketch over document tokens (heavy-hitter / hot-boilerplate
    // detection): CmsD independent hash rows from ONE md5 digest (four
    // disjoint 8-hex windows — the simhash move), CmsW counters each. The
    // counter table is ≤ CmsD·CmsW rows regardless of corpus size — the
    // map-side partial count collapses the explode before the shuffle —
    // and two sketches merge by summing counters.
    "sketch_cms_counters" -> ((s, dir) => cmsCounters(s, dir)),

    // Point-query observable: CMS estimate vs exact count for the exact
    // top-10 tokens. min-over-rows of the counters each candidate hashes
    // into; over_count = est − exact is the CMS one-sided error (≥ 0
    // ALWAYS — the sketch never undercounts; pinned in the spec).
    "sketch_cms_heavy_hitters" -> ((s, dir) => {
      val toks = docTokens(s, dir)
      val cand = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok").asc).limit(10)
      cand.withColumn("dg", md5(col("tok")))
        .select(col("tok"), col("exact_cnt"), explode(cmsRowIdx(col("dg"))).as("ri"))
        .select(col("tok"), col("exact_cnt"),
          col("ri.row_j").as("row_j"), col("ri.idx").as("idx"))
        .join(broadcast(cmsCounters(s, dir)), Seq("row_j", "idx"))
        .groupBy(col("tok"), col("exact_cnt"))
        .agg(min(col("cnt")).as("cms_est"))
        .select(col("tok"), col("exact_cnt"), col("cms_est"),
          (col("cms_est") - col("exact_cnt")).as("over_count"))
    }),

    // Mergeable quantile histogram over order values (distribution
    // monitoring at 100 TB): deterministic log-ish bins — two leading
    // decimal digits + magnitude of the integer cents, ≤ 10% relative bin
    // width, ~90 bins per decade — so the whole histogram is a few hundred
    // rows whatever the input size, merges by summing counts, and is
    // bit-exact cross-engine (string/integer ops only, no log()).
    "sketch_quantile_bins" -> ((s, dir) => quantileBins(s, dir)),

    // Quantile estimates read off the histogram (first bin whose running
    // count reaches ceil(q·n)) bracketed against the EXACT k-th order
    // statistic: contained must be true for every q by construction. At
    // 100 TB the exact rank pass is what the sketch replaces — here it is
    // the verification reference.
    "sketch_quantile_est" -> ((s, dir) => {
      val cents = orderCents(s, dir)
      val cum = quantileBins(s, dir).withColumn("cum",
        sum(col("cnt")).over(Window.orderBy(col("bin_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      import s.implicits._
      val ks = Seq(0.5, 0.9, 0.99).toDF("q")
        .crossJoin(cents.agg(count(lit(1)).as("n")))
        .withColumn("k", ceil(col("q") * col("n")).cast("long"))
      val ranked = cents.withColumn("r", row_number().over(Window.orderBy(col("v").asc)))
      val kth = ks.join(ranked, col("r") === col("k"))
        .select(col("q"), col("n"), col("k"), col("v").as("kth_cents"))
      val est = ks.select(col("q").as("eq"), col("k").as("ek"))
        .join(cum, col("cum") >= col("ek"))
        .groupBy(col("eq"))
        .agg(min_by(col("lo_cents"), col("bin_id")).as("est_lo_cents"),
          min_by(col("hi_cents"), col("bin_id")).as("est_hi_cents"))
      kth.join(est, col("q") === col("eq"))
        .select(col("q"), col("n"), col("k"), col("kth_cents"),
          col("est_lo_cents"), col("est_hi_cents"),
          (col("est_lo_cents") <= col("kth_cents") &&
            col("kth_cents") < col("est_hi_cents")).as("contained"))
    }),

    // Per-stratum deterministic sampling over documents: stratum = source,
    // rate(stratum) = 1000 + hex32(source) % 3000 basis points (10–40%),
    // keep iff hex32(doc_id || "|strat") % 10000 < rate. Stateless filter:
    // zero shuffles, zero state, reproducible under task retry.
    "q_stratified_sample" -> ((s, dir) => {
      val rateBps = lit(1000L) + hex32(col("source")) % 3000L
      val roll    = hex32(concat(col("doc_id").cast("string"), lit("|strat"))) % 10000L
      t(s, dir, "documents")
        .filter(roll < rateBps)
        .select(col("doc_id"), col("source"))
    }),

    // Exact-k per-stratum sampling ("distributed reservoir"): per source,
    // the k docs with the smallest salted hash — a deterministic uniform
    // draw that reruns/speculation/incremental arrival cannot perturb
    // (vs q_stratified_sample's RATE-based thin, which cannot promise a
    // size). The scale move is the PREFILTER: a hot stratum would drag
    // its full doc list through one window task, so a per-stratum hash
    // threshold keeping ~[[ReservoirPre]]·k expected survivors (exact
    // for strata ≤ that bound) cuts the window input to O(k) rows first
    // — the filter is stateless, and the window then ranks survivor
    // hashes only. Equivalence to the unfiltered top-k holds whenever ≥k
    // docs survive per stratum (P(fail) < 2^-40 at these factors;
    // deterministic given the data, so the oracle agrees row-for-row
    // regardless, and the spec pins survivor count ≥ k on every
    // stratum).
    "q_reservoir_sample" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          hex32(concat(col("doc_id").cast("string"), lit("|rsv"))).as("rh"))
      val counts = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("thr",
          least(lit(1L << 32), expr(s"${ReservoirPre * ReservoirK * (1L << 32)}L DIV n")))
        .select(col("source"), col("thr"))
      val w = Window.partitionBy(col("source")).orderBy(col("rh"), col("doc_id"))
      d.join(broadcast(counts), Seq("source"))
        .filter(col("rh") < col("thr"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= ReservoirK)
        .select(col("source"), col("doc_id"), col("rh"), col("rn"))
    }))

  val oracles: Map[String, String] = {
    val regCte =
      s"""regs AS (
         |  SELECT reg, max(rho) AS rho FROM (
         |    SELECT h % $M AS reg,
         |      CASE WHEN h // $M = 0 THEN ${WBits + 1}
         |           ELSE ${WBits + 1} - length(to_base(h // $M, 2)) END AS rho
         |    FROM (SELECT ${Dk.hex32("user_id::VARCHAR || '|' || props")} AS h FROM events))
         |  GROUP BY 1)""".stripMargin
    Map(
      "sketch_hll_registers" ->
        s"WITH $regCte SELECT reg, rho FROM regs",

      "q_distribution_drift" ->
        """WITH ev AS (
          |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
          |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid_day FROM ev),
          |halves AS (
          |  SELECT event_type,
          |    CASE WHEN day < mid_day THEN 'base' ELSE 'current' END AS half,
          |    count(*)::BIGINT AS n
          |  FROM ev, mid GROUP BY 1, 2),
          |tot AS (SELECT half, sum(n)::BIGINT AS tot FROM halves GROUP BY 1),
          |ppm AS (
          |  SELECT event_type, half, n, (n * 1000000) // tot AS ppm
          |  FROM halves JOIN tot USING (half)),
          |b AS (SELECT event_type, n AS n_base, ppm AS ppm_base
          |      FROM ppm WHERE half = 'base'),
          |c AS (SELECT event_type, n AS n_current, ppm AS ppm_current
          |      FROM ppm WHERE half = 'current')
          |SELECT event_type,
          |  coalesce(n_base, 0)::BIGINT AS n_base,
          |  coalesce(n_current, 0)::BIGINT AS n_current,
          |  coalesce(ppm_base, 0)::BIGINT AS ppm_base,
          |  coalesce(ppm_current, 0)::BIGINT AS ppm_current,
          |  abs(coalesce(ppm_current, 0) - coalesce(ppm_base, 0))::BIGINT AS drift_ppm,
          |  abs(coalesce(ppm_current, 0) - coalesce(ppm_base, 0)) > 20000 AS drifted
          |FROM b FULL OUTER JOIN c USING (event_type)""".stripMargin,
      "sketch_hll_estimate" ->
        s"""WITH $regCte,
           |sums AS (
           |  SELECT count(*) AS m_hit,
           |    sum((2.0 ^ (${WBits + 1} - rho))::BIGINT)::BIGINT AS hit_sum
           |  FROM regs),
           |ex AS (SELECT count(DISTINCT user_id::VARCHAR || '|' || props)::BIGINT
           |       AS exact_distinct FROM events)
           |SELECT m_hit, v_zero, raw_estimate, exact_distinct,
           |  round(raw_estimate / exact_distinct, 4) AS rel_to_exact
           |FROM (
           |  SELECT m_hit, $M - m_hit AS v_zero,
           |    round((0.7213 / (1.0 + 1.079 / ${M.toDouble})) * ${M.toDouble} * ${M.toDouble}
           |      / (((hit_sum + ($M - m_hit) * ${1L << (WBits + 1)})::DOUBLE) / ${(1L << (WBits + 1)).toDouble}),
           |      4) AS raw_estimate,
           |    exact_distinct
           |  FROM sums, ex)""".stripMargin,
      "q_stratified_sample" ->
        s"""SELECT doc_id, source FROM documents
           |WHERE ${Dk.hex32("doc_id::VARCHAR || '|strat'")} % 10000
           |    < 1000 + ${Dk.hex32("source")} % 3000""".stripMargin,

      "q_reservoir_sample" ->
        s"""WITH d AS (
           |  SELECT doc_id, source,
           |    ${Dk.hex32("doc_id::VARCHAR || '|rsv'")} AS rh
           |  FROM documents),
           |c AS (
           |  SELECT source,
           |    least(${1L << 32}, ${ReservoirPre * ReservoirK * (1L << 32)} // count(*)) AS thr
           |  FROM d GROUP BY 1)
           |SELECT source, doc_id, rh, rn FROM (
           |  SELECT d.source, d.doc_id, d.rh,
           |    row_number() OVER (PARTITION BY d.source ORDER BY d.rh, d.doc_id)::BIGINT AS rn
           |  FROM d JOIN c ON d.source = c.source
           |  WHERE d.rh < c.thr)
           |WHERE rn <= $ReservoirK""".stripMargin,
      // per-day rows computed per day; the total (day_key = -1) computed
      // INDEPENDENTLY from the global stream — if Spark's merged-register
      // total row hashes equal, the merge lost nothing
      "sketch_hll_daily" ->
        s"""WITH dbase AS (
           |  SELECT epoch_us(ts) // 86400000000 AS day_key,
           |    ${Dk.hex32("user_id::VARCHAR || '|' || props")} AS h,
           |    user_id::VARCHAR || '|' || props AS key
           |  FROM events),
           |rho0 AS (
           |  SELECT day_key, h % $M AS reg,
           |    CASE WHEN h // $M = 0 THEN ${WBits + 1}
           |         ELSE ${WBits + 1} - length(to_base(h // $M, 2)) END AS rho
           |  FROM dbase),
           |allregs AS (
           |  SELECT day_key, reg, max(rho) AS rho FROM rho0 GROUP BY 1, 2
           |  UNION ALL
           |  SELECT (-1)::BIGINT AS day_key, reg, max(rho) AS rho FROM rho0 GROUP BY 2),
           |sums AS (
           |  SELECT day_key, count(*) AS m_hit,
           |    sum((2.0 ^ (${WBits + 1} - rho))::BIGINT)::BIGINT AS hit_sum
           |  FROM allregs GROUP BY 1),
           |est AS (
           |  SELECT day_key, m_hit::BIGINT AS m_hit, ($M - m_hit)::BIGINT AS v_zero,
           |    round((0.7213 / (1.0 + 1.079 / ${M.toDouble})) * ${M.toDouble} * ${M.toDouble}
           |      / (((hit_sum + ($M - m_hit) * ${1L << (WBits + 1)})::DOUBLE) / ${(1L << (WBits + 1)).toDouble}),
           |      4) AS raw_estimate
           |  FROM sums),
           |exacts AS (
           |  SELECT day_key, count(DISTINCT key)::BIGINT AS exact_distinct
           |  FROM dbase GROUP BY 1
           |  UNION ALL
           |  SELECT (-1)::BIGINT, count(DISTINCT key)::BIGINT FROM dbase)
           |SELECT day_key, m_hit, v_zero, raw_estimate, exact_distinct,
           |  round(raw_estimate / exact_distinct, 4) AS rel_to_exact
           |FROM est JOIN exacts USING (day_key)""".stripMargin,
      "sketch_hll_intersect" -> {
        // raw estimator + the same LC small-range switch as the Spark side
        // (branch on the 4dp-rounded raw, so both engines pick one arm)
        val est = (src: String, keys: String) =>
          s"""SELECT $keys,
             |    CASE WHEN ($M - m_hit) > 0 AND raw_estimate <= ${2.5 * M}
             |      THEN round(${M.toDouble} * ln(${M.toDouble} / ($M - m_hit)), 4)
             |      ELSE raw_estimate END AS estimate
             |  FROM (
             |    SELECT $keys, count(*) AS m_hit,
             |      round((0.7213 / (1.0 + 1.079 / ${M.toDouble})) * ${M.toDouble} * ${M.toDouble}
             |        / (((sum((2.0 ^ (${WBits + 1} - rho))::BIGINT)
             |             + ($M - count(*)) * ${1L << (WBits + 1)})::DOUBLE)
             |           / ${(1L << (WBits + 1)).toDouble}), 4) AS raw_estimate
             |    FROM $src GROUP BY ALL)""".stripMargin
        s"""WITH base AS (
           |  SELECT event_type, user_id::VARCHAR || '|' || props AS key FROM events),
           |hs AS (SELECT event_type, ${Dk.hex32("key")} AS h FROM base),
           |rt AS (
           |  SELECT event_type, h % $M AS reg,
           |    CASE WHEN h // $M = 0 THEN ${WBits + 1}
           |         ELSE ${WBits + 1} - length(to_base(h // $M, 2)) END AS rho
           |  FROM hs),
           |regs AS (SELECT event_type, reg, max(rho) AS rho FROM rt GROUP BY 1, 2),
           |types AS (SELECT DISTINCT event_type FROM base),
           |pairs AS (
           |  SELECT a.event_type AS type_a, b.event_type AS type_b
           |  FROM types a JOIN types b ON a.event_type < b.event_type),
           |uregs AS (
           |  SELECT type_a, type_b, reg, max(rho) AS rho
           |  FROM pairs JOIN regs ON event_type = type_a OR event_type = type_b
           |  GROUP BY 1, 2, 3),
           |estt AS (${est("regs", "event_type")}),
           |estu AS (${est("uregs", "type_a, type_b")}),
           |dents AS (SELECT DISTINCT event_type, key FROM base),
           |ex AS (
           |  SELECT a.event_type AS type_a, b.event_type AS type_b,
           |    count(*)::BIGINT AS exact_intersect
           |  FROM dents a JOIN dents b
           |    ON a.key = b.key AND a.event_type < b.event_type
           |  GROUP BY 1, 2)
           |SELECT p.type_a, p.type_b, ea.estimate AS est_a, eb.estimate AS est_b,
           |  eu.estimate AS est_union,
           |  round(ea.estimate + eb.estimate - eu.estimate, 4) AS est_intersect,
           |  coalesce(ex.exact_intersect, 0)::BIGINT AS exact_intersect
           |FROM pairs p
           |  JOIN estt ea ON ea.event_type = p.type_a
           |  JOIN estt eb ON eb.event_type = p.type_b
           |  JOIN estu eu ON eu.type_a = p.type_a AND eu.type_b = p.type_b
           |  LEFT JOIN ex ON ex.type_a = p.type_a AND ex.type_b = p.type_b""".stripMargin
      },
      "sketch_cms_counters" ->
        s"WITH $cmsCountersCte SELECT row_j, idx, cnt FROM counters",
      "sketch_cms_heavy_hitters" ->
        s"""WITH $cmsCountersCte,
           |ex AS (
           |  SELECT tok, count(*)::BIGINT AS exact_cnt FROM toks
           |  GROUP BY 1 ORDER BY exact_cnt DESC, tok ASC LIMIT 10),
           |cr AS (
           |  SELECT tok, exact_cnt, row_j, $cmsIdxCase AS idx
           |  FROM (SELECT tok, exact_cnt, md5(tok) AS dg FROM ex),
           |       (SELECT unnest(generate_series(0, ${CmsD - 1})) AS row_j))
           |SELECT tok, exact_cnt, min(cnt)::BIGINT AS cms_est,
           |  (min(cnt) - exact_cnt)::BIGINT AS over_count
           |FROM cr JOIN counters USING (row_j, idx)
           |GROUP BY tok, exact_cnt""".stripMargin,
      "sketch_quantile_bins" ->
        s"WITH $quantileBinsCte SELECT bin_id, lo_cents, hi_cents, cnt FROM bins",
      "sketch_quantile_est" ->
        s"""WITH $quantileBinsCte,
           |cum AS (
           |  SELECT bin_id, lo_cents, hi_cents,
           |    sum(cnt) OVER (ORDER BY bin_id) AS cum
           |  FROM bins),
           |ks AS (
           |  SELECT q, n, ceil(q * n)::BIGINT AS k
           |  FROM (SELECT unnest([0.5, 0.9, 0.99]) AS q),
           |       (SELECT count(*)::BIGINT AS n FROM cents)),
           |ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM cents),
           |kth AS (
           |  SELECT q, n, k, v AS kth_cents FROM ks JOIN ranked ON r = k),
           |est AS (
           |  SELECT q AS eq,
           |    arg_min(lo_cents, bin_id) AS est_lo_cents,
           |    arg_min(hi_cents, bin_id) AS est_hi_cents
           |  FROM ks JOIN cum ON cum >= k GROUP BY 1)
           |SELECT q, n, k, kth_cents, est_lo_cents, est_hi_cents,
           |  (est_lo_cents <= kth_cents AND kth_cents < est_hi_cents) AS contained
           |FROM kth JOIN est ON q = eq""".stripMargin)
  }

  /** One CASE arm per CMS row: row j reads hex window 1+8j of the digest. */
  private def cmsIdxCase: String =
    "CASE row_j " +
      (0 until CmsD).map(j => s"WHEN $j THEN ${Dk.hex32Of("dg", 1 + 8 * j)}").mkString(" ") +
      s" END % $CmsW"

  private def cmsCountersCte: String =
    s"""toks AS (
       |  SELECT unnest(${Dk.tokens("text")}) AS tok FROM documents),
       |rowed AS (
       |  SELECT row_j, $cmsIdxCase AS idx
       |  FROM (SELECT md5(tok) AS dg FROM toks),
       |       (SELECT unnest(generate_series(0, ${CmsD - 1})) AS row_j)),
       |counters AS (
       |  SELECT row_j::BIGINT AS row_j, idx, count(*)::BIGINT AS cnt
       |  FROM rowed GROUP BY 1, 2)""".stripMargin

  private def quantileBinsCte: String =
    s"""cents AS (
       |  SELECT round(l_extendedprice * 100)::BIGINT AS v FROM lineitem),
       |b2 AS (
       |  SELECT v, length(v::VARCHAR)::BIGINT AS mag,
       |    power(10, greatest(length(v::VARCHAR)::BIGINT - 2, 0))::BIGINT AS tens
       |  FROM cents),
       |bins AS (
       |  SELECT mag * 100 + (v // tens) AS bin_id,
       |    (v // tens) * tens AS lo_cents,
       |    ((v // tens) + 1) * tens AS hi_cents,
       |    count(*)::BIGINT AS cnt
       |  FROM b2 GROUP BY 1, 2, 3)""".stripMargin
}
