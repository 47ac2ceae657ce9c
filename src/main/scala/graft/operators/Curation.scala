package graft.operators

import graft.functions.TextKernels._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs after dedup:
  * deterministic train/val splitting, token-budget shard packing, and
  * benchmark decontamination. All built-ins (md5-derived hashing, window
  * aggregates), so each has an exact DuckDB oracle.
  *
  * Scale design:
  *  - the split is a pure per-row hash — no shuffle, no global state, and
  *    stable under corpus growth (a doc never migrates between splits when
  *    new data arrives, unlike rand() or row_number schemes);
  *  - shard packing windows WITHIN a hash bucket, never globally: a global
  *    cumulative sum would serialize 10^12 rows through one task; the
  *    bucket is the parallelism unit (at scale: repartitionByRange or the
  *    natural partition), and shard ids are (bucket, local_shard) pairs;
  *  - decontamination joins on a winnowed fingerprint (one 8-gram min
  *    digest per doc) — an equi-join on a short key, not an all-pairs
  *    text comparison; near-dup leakage rides the same fingerprint.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Tokens-per-doc budget for one packed shard (tiny for the sf corpora;
    * a real run uses ~the sequence length × rows per file). */
  private val ShardBudget = 2048L
  private val PackBuckets = 8L
  private val TrainPct    = 90L
  private val FpWindow    = 64 // decontamination fingerprint char width

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic 90/10 train/val split: md5 of a salted doc key — no
    // rand(), so reruns and incremental arrivals never reshuffle splits.
    "q_train_split" -> ((s, dir) => {
      val h = hex32(concat(lit("split:"), col("doc_id").cast("string"))) % 100
      docs(s, dir).select(col("doc_id"),
        h.as("split_hash"),
        when(h < TrainPct, lit("train")).otherwise(lit("val")).as("split"))
    }),

    // Token-budget shard packing: docs are packed in doc_id order WITHIN a
    // hash bucket; a doc opens a new shard when the bucket's running token
    // count crosses the budget. Output shard key = (bucket, shard).
    "text_shard_pack" -> ((s, dir) => {
      val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"),
          (hex32(concat(lit("pack:"), col("doc_id").cast("string"))) % PackBuckets).as("bucket"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .withColumn("shard", floor((col("cum_tokens") - col("n_tokens")) / ShardBudget))
    }),

    // Benchmark decontamination: flag corpus docs sharing a winnowed
    // 64-char fingerprint with a (here: derived) benchmark set — the
    // equi-join shape of contamination checking (64-char windows make the
    // fingerprint a content match, not a common-substring MinHash). The
    // planted benchmark is every 10th doc with a token appended (a
    // near-dup, as real leakage is), so matches are genuine fingerprint
    // survivals, not id equality.
    "q_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), winnowMin(col("text"), FpWindow).as("fp"))
      val bench = docs(s, dir).filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 500000L).as("bench_id"),
          winnowMin(concat(col("text"), lit(" tailmarker")), FpWindow).as("fp"))
      d.join(bench, Seq("fp"))
        .select(col("doc_id"), col("bench_id"), col("fp"))
    }))

  // --- DuckDB oracles -----------------------------------------------------

  val oracles: Map[String, String] = Map(
    "q_train_split" ->
      s"""SELECT doc_id,
         |  ${Dk.hex32("'split:' || doc_id::VARCHAR")} % 100 AS split_hash,
         |  CASE WHEN ${Dk.hex32("'split:' || doc_id::VARCHAR")} % 100 < $TrainPct
         |       THEN 'train' ELSE 'val' END AS split
         |FROM documents""".stripMargin,
    "text_shard_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    ${Dk.hex32("'pack:' || doc_id::VARCHAR")} % $PackBuckets AS bucket,
         |    len(${Dk.tokens("text")})::BIGINT AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, bucket, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) AS cum_tokens
         |  FROM t)
         |SELECT doc_id, bucket, n_tokens, cum_tokens::BIGINT AS cum_tokens,
         |  ((cum_tokens - n_tokens) // $ShardBudget)::BIGINT AS shard
         |FROM c""".stripMargin,
    "q_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, ${Dk.winnowMin("text", FpWindow)} AS fp FROM documents),
         |bench AS (
         |  SELECT doc_id + 500000 AS bench_id,
         |    ${Dk.winnowMin("text || ' tailmarker'", FpWindow)} AS fp
         |  FROM documents WHERE doc_id % 10 = 3)
         |SELECT d.doc_id, bench.bench_id, d.fp
         |FROM d JOIN bench USING (fp)""".stripMargin)
}
