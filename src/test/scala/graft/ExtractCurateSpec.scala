package graft

import graft.operators.ExtractQueries
import graft.plans.{ExtractJob, GoldenDiff}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composition property of the extraction→curation flagship: the
  * planted boilerplate-duplicates (same content, different furniture) can
  * only be deduplicated AFTER boilerplate stripping — raw-byte dedup
  * cannot merge them, the composed pipeline must. */
class ExtractCurateSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("boilerplate-duplicates dedup only after extraction; no copy survives curation") {
    val packed = SparkEntry.queries("extract_curate")(spark, "/root/testdata/sf0.001").cache()
    try {
      assert(packed.count() > 0)
      // every "_b" copy extracted to text identical to its original, so
      // exact dedup (min doc_id keeper: "doc_x" < "doc_x_b") killed it
      assert(packed.filter(col("doc_id").endsWith("_b")).count() == 0,
        "a boilerplate-duplicate copy survived curation")
    } finally { packed.unpersist(); () }
  }

  test("raw span bytes differ between original and copy; extracted text is identical") {
    import spark.implicits._
    // local val: a suite field would drag the non-serializable test engine
    // into the flatMap closure
    val boiler =
      """<div><a href="#home">home</a> <a href="#about">about</a> <a href="#terms">terms</a></div>"""
    val parts = spark.sparkContext.defaultParallelism
    val base = ExtractJob.generateInputs(spark, 60L, 13L, parts)
      .filter((d: Document) => d.doc_id.stripPrefix("doc_").toLong % 10 == 3)
    val withCopies = base.flatMap { d =>
      val off = if (d.spans.isEmpty) 0 else d.spans.map(_.offset).max + 1
      Seq(d, Document(d.doc_id + "_b", d.spans :+ Span(Span.Kind.Html, boiler, "", off)))
    }
    def textHashes(df: org.apache.spark.sql.DataFrame): Map[String, String] = df
      .groupBy(col("doc_id"))
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("text")))),
          x => x.getField("text")), " ")).as("h"))
      .as[(String, String)].collect().toMap
    val raw = textHashes(GoldenDiff.explodeSpans(withCopies))
    val ext = ExtractQueries.spansToText(GoldenDiff.explodeSpans(
        ExtractJob.extract(withCopies, numPartitions = parts)))
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(String, String)].collect().toMap
    val originals = raw.keys.filterNot(_.endsWith("_b")).toSeq.sorted
    assert(originals.size == 6 && raw.size == 12)
    originals.foreach { id =>
      assert(raw(id) != raw(id + "_b"), s"$id: raw concat collided — copy planted wrong")
      assert(ext(id) == ext(id + "_b"), s"$id: extraction did not strip the planted boilerplate")
    }
  }
}
