package graft.operators

import graft.functions.TextKernels.{hex32, Dk}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch and deterministic-sampling operators — the
  * "count/sample a 100 TB column without moving it" family.
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll_registers" -> ((s, dir) => registers(s, dir)),

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
           |    < 1000 + ${Dk.hex32("source")} % 3000""".stripMargin)
  }
}
