package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** CurateMain's resume semantics: stage-boundary materialization means a
  * killed-and-rerun curation re-pays nothing upstream of the last
  * committed stage. The hard proof: rerun with the INPUT DELETED — the
  * run can only succeed from the durable stage tables (the signature
  * pass physically cannot be re-paid), and the packed output must be
  * identical to the uninterrupted run's (every stage is deterministic). */
class CurateResumeSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def deleteRec(p: java.nio.file.Path): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  test("kill-and-rerun without the input reproduces identical shards from stage tables") {
    val tmp    = Files.createTempDirectory("curate-resume").toString
    val input  = s"$tmp/input"
    val outA   = s"$tmp/outA"
    val outB   = s"$tmp/outB"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .write.parquet(input)

    // uninterrupted reference run
    CurateMain.run(spark, input, outA)
    val refRows = spark.read.parquet(s"$outA/packed").cache()
    assert(refRows.count() > 0)

    // run B completes its stages, then "crashes" before/while packing:
    // simulate by deleting the packed output (stage tables survive)
    CurateMain.run(spark, input, outB)
    deleteRec(Paths.get(s"$outB/packed"))
    // the input disappears too — a resume that re-reads it would die
    deleteRec(Paths.get(input))
    val json = CurateMain.run(spark, input, outB)
    assert(json.contains("\"docsIn\""), json)

    // collect eagerly: the next rerun overwrites these files, and a lazy
    // frame would re-list deleted parts
    def multiset(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(_.toString).groupBy(identity).view.mapValues(_.size).toMap
    val refSet     = multiset(refRows.collect().toSeq)
    val resumedSet = multiset(spark.read.parquet(s"$outB/packed").collect().toSeq)
    assert(resumedSet == refSet, "resumed shards differ from the uninterrupted run")
    refRows.unpersist()

    // and a half-written stage is NOT reused: no _SUCCESS ⇒ recompute.
    // (drop clusters' marker; the rerun must rebuild it from deduped+banded
    // — still no input needed)
    Files.deleteIfExists(Paths.get(s"$outB/stages/clusters/_SUCCESS"))
    deleteRec(Paths.get(s"$outB/packed"))
    CurateMain.run(spark, input, outB)
    val resumed2Set = multiset(spark.read.parquet(s"$outB/packed").collect().toSeq)
    assert(resumed2Set == resumedSet)
  }
}
