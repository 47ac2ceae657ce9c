package graft

import graft.plans.{ContentHash, ExtractJob, ManifestIO}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two Scala/Column twin pairs the accumulator-side manifest
  * stats depend on: ContentHash.docHash == xxhash64(canonical column) and
  * ManifestIO.bucketValue == bucketExpr, over a generated corpus that
  * exercises every span kind plus null/empty edge docs. If either engine
  * primitive ever changed semantics, these fail loudly and the manifest
  * code must not ship. */
class ContentHashSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def corpus = {
    import spark.implicits._
    ExtractJob.generateInputs(spark, 500, 7L, 8)
      .union(Seq(
        Document("empty", Seq.empty),
        Document("nullref", Seq(Span("text", "abc", null, 0))),
        Document("nulltext", Seq(Span("text", null, "m1", 3)))).toDS())
  }

  test("docHash (Scala) == xxhash64 of the canonical column (Catalyst)") {
    import spark.implicits._
    val viaCol = corpus.toDF()
      .select(col("doc_id"), ContentHash.hashCol.as("h"))
      .as[(String, Long)].collect().toMap
    val viaScala = corpus.collect().map(d => d.doc_id -> ContentHash.docHash(d)).toMap
    assert(viaScala.size == viaCol.size)
    viaScala.foreach { case (id, h) => assert(viaCol(id) == h, s"doc $id") }
  }

  test("bucketValue (Scala) == bucketExpr (Catalyst) across bucket counts and salts") {
    import spark.implicits._
    for ((n, salt) <- Seq((16, 0), (64, 0), (256, 3))) {
      val viaCol = corpus.toDF()
        .select(col("doc_id"), ManifestIO.bucketExpr(n, salt).as("b"))
        .as[(String, Int)].collect().toMap
      viaCol.foreach { case (id, b) =>
        assert(ManifestIO.bucketValue(id, n, salt) == b, s"doc $id n=$n salt=$salt")
      }
    }
  }

  test("accumulator-fed manifests equal read-back manifests (same content, same hash)") {
    import spark.implicits._
    val dir1 = java.nio.file.Files.createTempDirectory("graft-chs-acc").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft-chs-rb").toString
    val acc  = new graft.plans.BucketStatsAccumulator
    spark.sparkContext.register(acc, "chs-bucket-stats")
    val n = 16
    val fusedOut = ExtractJob.extract(corpus, n,
      partitionExpr = Some(ManifestIO.bucketExpr(n)),
      bucketStats = Some((acc, n, 0)))
    val viaAcc = ManifestIO.write(fusedOut, dir1, n, "acc-run",
      prePartitioned = true, statsSource = Some(acc))
    val viaRb = ManifestIO.write(ExtractJob.extract(corpus, n), dir2, n, "rb-run")
    assert(viaAcc.sortBy(_.bucket) == viaRb.sortBy(_.bucket))
  }
}
