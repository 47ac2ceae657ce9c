package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The banded-signature memo must be BOUNDED: localCheckpoint blocks are
  * invisible to `clearCache`, so an unbounded tag→frame map would leak
  * executor storage for the JVM's lifetime in a long multi-corpus session
  * (one frame per corpus tag, never evicted — the round-3 shape). */
class DedupMemoSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def tinyCorpus(tag: Int) = {
    import spark.implicits._
    (0 until 30).map(i => (i.toLong, s"corpus $tag doc $i has some words to shingle over here"))
      .toDF("doc_id", "text")
  }

  test("a new corpus tag evicts the oldest entry's checkpoint blocks beyond the cap") {
    Dedup.bandedMemoClear()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val oldCap = Dedup.bandedMemoCap
    try {
      Dedup.bandedMemoCap = 2
      Dedup.lshBandStats(tinyCorpus(1), Some("memo-spec#t1")).collect()
      Dedup.lshBandStats(tinyCorpus(2), Some("memo-spec#t2")).collect()
      val afterTwo = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(afterTwo.size == 2, s"expected 2 memo-backed RDDs, saw $afterTwo")
      // third tag: cap 2 ⇒ tag 1's blocks must be unpersisted, not leaked
      Dedup.lshBandStats(tinyCorpus(3), Some("memo-spec#t3")).collect()
      val afterThree = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(afterThree.size == 2, s"memo leaked checkpoint blocks: $afterThree")
      // the survivors are the two NEWEST (t2's blocks survived, t1's died)
      assert(afterTwo.intersect(afterThree).size == 1)
      // a re-request of the evicted tag recomputes (fresh blocks), still capped
      Dedup.lshBandStats(tinyCorpus(1), Some("memo-spec#t1")).collect()
      assert((spark.sparkContext.getPersistentRDDs.keySet -- before).size == 2)
    } finally {
      Dedup.bandedMemoCap = oldCap
      Dedup.bandedMemoClear()
    }
  }

  test("bandedMemoClear frees every memoized frame's blocks") {
    Dedup.bandedMemoClear()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.lshBandStats(tinyCorpus(7), Some("memo-spec#clear")).collect()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty)
    Dedup.bandedMemoClear()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "clear() left checkpoint blocks behind")
  }
}
