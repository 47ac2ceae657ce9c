package graft

import graft.functions.TextKernels
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production hash swap (md5-derived `hex32` → xxhash64-derived
  * `hex32Fast`) must change the COST of the signature pass, not the
  * SEMANTICS of dedup. These tests pin the hash-agnosticism contract the
  * BENCH doc claims:
  *  - exact dedup groups on a content hash — any collision-free hash
  *    yields the same keepers;
  *  - MinHash-LSH candidates differ per hash family, but the
  *    exact-Jaccard verify stage re-filters every candidate against the
  *    true shingle sets, so precision is exact under either hash and
  *    planted-pair recall keeps the same banding profile.
  */
class DedupHashStrategySpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("hex32Fast has the hex32 value contract: non-negative, < 2^32") {
    val stats = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextKernels.tokens(col("text"))).as("tok"))
      .select(TextKernels.hex32Fast(col("tok")).as("h"))
      .agg(min("h"), max("h"), countDistinct("h")).head()
    assert(stats.getLong(0) >= 0L)
    assert(stats.getLong(1) < (1L << 32))
    assert(stats.getLong(2) > 1L) // not degenerate
  }

  test("exact dedup keepers are hash-agnostic") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    def keepers(h: org.apache.spark.sql.Column) = docs
      .groupBy(h.as("k")).agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
      .select("keep_id", "cnt")
    val viaMd5 = keepers(md5(col("text"))).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaXx  = keepers(xxhash64(col("text"))).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaMd5.sameElements(viaXx))
  }

  test("fast-hash LSH keeps planted-pair recall and exact-verify precision") {
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    // same planted-near-dup construction as the catalog's dup corpus:
    // every doc gets a +1e6 twin differing by one appended token
    val corpus = d.unionByName(d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" zzz")).as("text")))

    val out = Dedup.minhashLsh(corpus, fastHash = true).cache()

    // recall: docs with >= 9 tokens have planted-pair jaccard
    // (n-2)/(n-1) >= 0.875, comfortably over the 0.8 verify threshold —
    // the same >= 95% banding-recall bar the md5 path is held to
    val eligible = d.filter(size(TextKernels.tokens(col("text"))) >= 9).count()
    val planted  = out.filter(col("doc_b") === col("doc_a") + 1000000L).count()
    assert(planted >= eligible * 95 / 100, s"found $planted of $eligible planted pairs")

    // precision: recompute jaccard from TEXT for every reported pair —
    // independent of the LSH plumbing, this pins that the verify stage
    // filtered candidates against ground truth under the fast hash too
    def sets(side: String) = corpus.select(col("doc_id").as(side),
      TextKernels.shingles3(TextKernels.tokens(col("text"))).as(s"sh_$side"))
    val rechecked = out.join(sets("doc_a"), Seq("doc_a")).join(sets("doc_b"), Seq("doc_b"))
      .withColumn("i", size(array_intersect(col("sh_doc_a"), col("sh_doc_b"))))
      .withColumn("j", col("i") / (size(array_distinct(col("sh_doc_a"))) +
        size(array_distinct(col("sh_doc_b"))) - col("i")))
      .agg(min("j")).head().getDouble(0)
    assert(rechecked >= 0.8, f"fast-hash path emitted a sub-threshold pair (min jaccard $rechecked%.3f)")
    out.unpersist()
  }
}
