package graft

import graft.functions.VectorKernels
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The case hamming-1 multiprobe exists for: a true near-dup pair whose
  * vectors straddle exactly ONE hyperplane lands in two buckets one bit
  * apart — the round-3 single-probe join silently missed it. The pair is
  * CONSTRUCTED to straddle: both vectors share their component orthogonal
  * to plane 0 and carry ±ε along plane 0, so their plane-0 signs differ,
  * every other plane sign agrees, and cosine ≈ 1. */
class DedupEmbeddingSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dims   = 64
  private val planes = 4

  test("multiprobe catches the one-hyperplane straddling pair single-probe misses") {
    import spark.implicits._
    val p0 = VectorKernels.hyperplane(0, dims)
    val u  = (0 until dims).map(i => ((i * 37) % 13 - 6).toDouble)
    val p0n  = p0.map(x => x * x).sum
    val proj = u.zip(p0).map { case (a, b) => a * b }.sum / p0n
    val w    = u.zip(p0).map { case (a, b) => a - proj * b }
    val eps  = 1e-4
    val x = w.zip(p0).map { case (a, b) => a + eps * b }
    val y = w.zip(p0).map { case (a, b) => a - eps * b }
    val df = Seq((1L, x), (2L, y)).toDF("vec_id", "v")

    // precondition: the pair really is bucket-hamming-1 (plane 0 flipped)
    val bkts = df.select(VectorKernels.lshBucket(col("v"), planes, dims).as("b"))
      .as[Long].collect().toSeq
    assert(java.lang.Long.bitCount(bkts(0) ^ bkts(1)) == 1, s"buckets $bkts")

    val single = Dedup.embeddingNearDups(df, planes, dims, probeHamming = 0)
    assert(single.isEmpty, "single-probe should miss the straddling pair")

    val multi = Dedup.embeddingNearDups(df, planes, dims)
      .select("vec_a", "vec_b", "probe_dist").as[(Long, Long, Long)].collect().toSeq
    assert(multi == Seq((1L, 2L, 1L)), multi.toString)
  }

  test("same-bucket pairs surface exactly once, at probe_dist 0") {
    import spark.implicits._
    // two near-identical vectors (same bucket) + one orthogonal-ish decoy
    val a = (0 until dims).map(i => (i % 5 + 1).toDouble)
    val b = a.map(_ * 1.0001)
    val c = (0 until dims).map(i => if (i % 2 == 0) 3.0 else -3.0)
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "v")
    val rows = Dedup.embeddingNearDups(df, planes, dims)
      .select("vec_a", "vec_b", "probe_dist").as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 2L, 0L)), rows.toString)
  }

  test("semantic dedup (k-means cells): exact precision, cell-boundary-bounded recall") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("dedup_semantic")(spark, dir).cache()
    // precision is exact: survivors are cosine-verified, and only the
    // planted perturbed twins sit above 0.99 in this corpus
    assert(out.filter(col("vec_b") =!= col("vec_a") + 100000L).count() == 0)
    assert(out.agg(org.apache.spark.sql.functions.min("cos")).head().getDouble(0) >= 0.99)
    // recall: a planted pair is missed only when the perturbation crosses
    // a k-means cell boundary — must stay high, like the LSH path
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.count() >= n * 85 / 100, s"cell recall collapsed: ${out.count()} of $n")
    out.unpersist()
  }
}
