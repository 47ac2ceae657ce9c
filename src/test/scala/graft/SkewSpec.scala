package graft

import graft.plans.{ExtractJob, LineageAccumulator}
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling: the corpus plants mega-documents (2 of every 20 docs are
  * ~50x normal size — Corpus doc types 1|2), and the salted hash
  * repartition must still spread DOCUMENTS uniformly so no task pins a
  * file-order run of mega-docs. Verified through the lineage accumulator
  * the north rule requires (per-partition docs/spans/errors/nanos). */
class SkewSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("salted repartition spreads docs and spans across partitions") {
    val lineage = new LineageAccumulator
    spark.sparkContext.register(lineage, "skew-spec")
    val parts = 8
    val out   = ExtractJob.extract(
      ExtractJob.generateInputs(spark, 4000, 42L, parts), parts, lineage = Some(lineage))
    out.toDF().write.format("noop").mode("overwrite").save()

    val stats = lineage.value
    assert(stats.size == parts, s"expected $parts partitions, saw ${stats.size}")
    val docs = stats.values.map(_.docs)
    assert(docs.sum == 4000)
    // uniform hash: every partition within 2x of the mean doc count
    assert(docs.max <= 2 * (4000 / parts), s"doc skew: $docs")
    // span counts (where mega-docs would show) also bounded: no partition
    // carries more than 2.5x the mean span load
    val spans = stats.values.map(_.spans)
    assert(spans.max <= (2.5 * spans.sum / parts).toLong, s"span skew: $spans")
    assert(stats.values.map(_.errors).sum == 0)
  }
}
