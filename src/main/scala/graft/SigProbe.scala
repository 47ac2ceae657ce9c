package graft

import graft.functions.TextKernels._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition bench of the MinHash signature-pass cost — the
  * measurement that drove the shingle-hash design (third run of each
  * stage is reported; first two warm codegen/page cache):
  *
  *   tokens            0.3 s   regex split only
  *   tokens+shingles   6.2 s   + concat_ws shingle STRINGS  ← 95% of cost
  *   sh+md5hash        7.0 s   + md5 per shingle            (digest adds 0.8 s)
  *   sh+xxhash         7.3 s   xxhash64 instead: NO win — strings dominate
  *   tokhash+poly      0.4 s   md5 per TOKEN + integer shingle combine
  *   tokhash+poly-xx   0.2 s   same with xxhash64 token hash
  *
  * Conclusion shipped in `TextKernels.shingleHashes`: never materialize
  * shingle strings; hash tokens once and combine arithmetically (~18×,
  * and oracle-portable). The md5→xxhash64 swap — the obvious-looking fix
  * — was measured to be worth almost nothing while strings dominated. */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    def t(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        if (i == 2) println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    t("tokens")(docs.select(tokens(col("text")).as("tk")))
    t("tokens+shingles")(docs.select(shingles3(tokens(col("text"))).as("sh")))
    t("sh+md5hash")(docs.withColumn("sh", shingles3(tokens(col("text"))))
      .select(transform(col("sh"), s => hex32(s)).as("hs")))
    t("sh+xxhash")(docs.withColumn("sh", shingles3(tokens(col("text"))))
      .select(transform(col("sh"), s => hex32Fast(s)).as("hs")))
    t("sh+md5raw")(docs.withColumn("sh", shingles3(tokens(col("text"))))
      .select(transform(col("sh"), s => md5(s)).as("hs")))
    // token-hash + polynomial window combine: no shingle strings at all
    t("tokhash+poly")(docs
      .withColumn("th", transform(tokens(col("text")), tk => hex32(tk)))
      .select(when(size(col("th")) >= 3,
        transform(sequence(lit(0), size(col("th")) - 3), i =>
          (element_at(col("th"), i + 1) * 1000003L % 4294967296L * 1000003L % 4294967296L
            + element_at(col("th"), i + 2) * 1000003L % 4294967296L
            + element_at(col("th"), i + 3)) % 4294967296L))
        .otherwise(array().cast("array<long>")).as("hs")))
    t("tokhash+poly-xx")(docs
      .withColumn("th", transform(tokens(col("text")), tk => hex32Fast(tk)))
      .select(when(size(col("th")) >= 3,
        transform(sequence(lit(0), size(col("th")) - 3), i =>
          (element_at(col("th"), i + 1) * 1000003L % 4294967296L * 1000003L % 4294967296L
            + element_at(col("th"), i + 2) * 1000003L % 4294967296L
            + element_at(col("th"), i + 3)) % 4294967296L))
        .otherwise(array().cast("array<long>")).as("hs")))
    // full signature pass both ways for reference
    t("full-banded-md5")(graft.operators.Dedup.bandedKeysFor(docs))
    t("full-banded-xx")(graft.operators.Dedup.bandedKeysFor(docs, fastHash = true))
    spark.stop()
  }
}
