package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextKernels._
import graft.operators.Dedup

/** The two exact pair-generation operators added on top of the LSH
  * family: asymmetric containment (the measure Jaccard cannot see) and
  * the prefix-filtered all-pairs cosine join (the candidate set LSH can
  * only approximate). Both are checked against ground truth computed a
  * DIFFERENT way — planted-quote geometry resp. an exhaustive
  * shared-feature join — not just against their own outputs.
  */
class AllPairsContainmentSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("dedup_containment: every planted quote is fully contained; Jaccard would miss it") {
    val out = SparkEntry.queries("dedup_containment")(spark, dir).cache()
    try {
      // eligible sources: doc_id % 20 == 0 with >= QuoteMinToks tokens
      val eligible = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(col("doc_id") % 20 === 0 && size(col("toks")) >= Dedup.QuoteMinToks)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(eligible.nonEmpty, "corpus lost its plantable sources")
      val planted = out.filter(col("doc_b") === col("doc_a") + Dedup.QuoteIdOffset)
        .cache()
      try {
        val found = planted.select("doc_a").collect().map(_.getLong(0)).toSet
        assert(found == eligible, s"planted pairs ${found.size}/${eligible.size}")
        // the quote side is FULLY contained (its shingles are a consecutive
        // run of the source's)
        assert(planted.filter(col("cont_b_ppm") =!= 1000000L).count() == 0)
        // asymmetry is load-bearing: at least one planted pair sits BELOW
        // the same 0.8 bar under the symmetric union measure — a Jaccard
        // path at this threshold provably misses it
        // union-ppm < ContainMinPpm ⟺ n_common·1e6 < |A∪B|·ContainMinPpm
        val missedByJaccard = planted.filter(
          col("n_common") * 1000000L <
            (col("size_a") + col("size_b") - col("n_common")) * Dedup.ContainMinPpm)
        assert(missedByJaccard.count() > 0, "no planted pair separates the measures")
      } finally { planted.unpersist(); () }
      // basic lattice sanity on everything reported
      assert(out.filter(col("n_common") > least(col("size_a"), col("size_b")))
        .count() == 0)
      assert(out.filter(col("cont_a_ppm") > 1000000L || col("cont_b_ppm") > 1000000L)
        .count() == 0)
    } finally { out.unpersist(); () }
  }

  test("dedup_allpairs_cosine: prefix filtering is COMPLETE vs an exhaustive join") {
    val out = SparkEntry.queries("dedup_allpairs_cosine")(spark, dir).cache()
    try {
      // ground truth on a 100-source slice (plus their planted copies),
      // via the exhaustive any-shared-shingle join — sound because any
      // pair with cos >= 0.9 shares >= ceil(0.81*|x|) >= 1 shingle
      val slice = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text"))
      val corpus = slice.unionByName(slice.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text")))
      val d = corpus.withColumn("th", tokenHashes(tokens(col("text"))))
        .select(col("doc_id"), array_distinct(shingleHashes(col("th"))).as("ts"))
        .cache()
      try {
        val post = d.select(col("doc_id"), explode(col("ts")).as("t"))
        val brute = post.as("l").join(post.as("r"),
            col("l.t") === col("r.t") && col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
          .distinct()
          .join(d.select(col("doc_id").as("doc_a"), col("ts").as("ta")), Seq("doc_a"))
          .join(d.select(col("doc_id").as("doc_b"), col("ts").as("tb")), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            size(array_intersect(col("ta"), col("tb"))).cast("long").as("i"),
            size(col("ta")).cast("long").as("na"),
            size(col("tb")).cast("long").as("nb"))
          .filter(col("i") * col("i") * 100L >= col("na") * col("nb") * 81L)
          .select("doc_a", "doc_b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val ids = d.select("doc_id").collect().map(_.getLong(0)).toSet
        val got = out
          .filter(col("doc_a").isin(ids.toSeq: _*) && col("doc_b").isin(ids.toSeq: _*))
          .select("doc_a", "doc_b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == brute,
          s"prefix filter missed ${(brute -- got).take(5)} / invented ${(got -- brute).take(5)}")
        // every planted copy pair qualifies (cos^2 = |O|/(|O|+1) >= 0.81
        // for >= 5 shingles; every sf doc has >= 10 tokens)
        val plantedMissing = ids.filter(_ < 1000000L)
          .map(id => (id, id + 1000000L)) -- brute
        assert(plantedMissing.isEmpty, s"planted pairs absent: ${plantedMissing.take(5)}")
      } finally { d.unpersist(); () }
      // the verify predicate holds on everything reported, on the lattice
      assert(out.filter(col("n_common") * col("n_common") * 100L <
        col("size_a") * col("size_b") * 81L).count() == 0)
      assert(out.filter(col("cos2_ppm") > 1000000L || col("cos2_ppm") < 810000L)
        .count() == 0)
    } finally { out.unpersist(); () }
  }
}
