package graft

import graft.corpus.EvalCorpus
import graft.eval.{EvalJob, J, Normalize}
import graft.functions.Kernels
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** S3 as the reference ships it — one JSON object per golden file
  * (eval_script_field_level.py:90-92) — through real Spark sources:
  * wholetext round-trip, `spark.read.json` with multiLine + an explicit
  * schema, and the PERMISSIVE `_corrupt_record` path with the F13
  * json_repair fallback. */
class JsonSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def seeded(n: Int): Seq[EvalJob.JsonDoc] =
    (0 until n).map { i =>
      EvalJob.JsonDoc(f"doc_$i%04d", if (i % 2 == 0) "set-a" else "set-b",
        J.canonical(EvalCorpus.groundTruth(i.toLong, 5L)))
    }

  test("writeJsonDocDir / readJsonDocDir round-trips one-object-per-file trees") {
    val dir  = tmpDir("graft-json-rt")
    val docs = seeded(40)
    EvalJob.writeJsonDocDir(spark.createDataset(docs), dir)
    val back = EvalJob.readJsonDocDir(spark, dir).collect().sortBy(_.doc_id)
    assert(back.length == 40)
    assert(back.toSeq == docs.sortBy(_.doc_id))
  }

  test("file-mode evaluation equals in-memory evaluation") {
    val gDir = tmpDir("graft-json-g")
    val pDir = tmpDir("graft-json-p")
    val goldens = spark.createDataset(seeded(30))
    val preds = spark.createDataset((0 until 30).map { i =>
      EvalJob.JsonDoc(f"doc_$i%04d", if (i % 2 == 0) "set-a" else "set-b",
        J.canonical(EvalCorpus.prediction(i.toLong, 5L, if (i % 2 == 0) 0.0 else 0.2)))
    })
    EvalJob.writeJsonDocDir(goldens, gDir)
    EvalJob.writeJsonDocDir(preds, pDir)
    val mem  = EvalJob.evaluate(preds, goldens).collect().sortBy(_.file)
    val file = EvalJob.evaluate(
      EvalJob.readJsonDocDir(spark, pDir), EvalJob.readJsonDocDir(spark, gDir))
      .collect().sortBy(_.file)
    assert(file.toSeq == mem.toSeq)
  }

  test("convertGroundTruths output survives the file round-trip byte-exactly") {
    val dir = tmpDir("graft-json-conv")
    val gts = spark.createDataset(seeded(10))
    val converted = EvalJob.convertGroundTruths(gts)
      .map { case (id, json) => EvalJob.JsonDoc(id, "converted", json) }
    EvalJob.writeJsonDocDir(converted, dir)
    val back = EvalJob.readJsonDocDir(spark, dir).collect().sortBy(_.doc_id)
    val want = converted.collect().sortBy(_.doc_id)
    assert(back.toSeq == want.toSeq)
    // and the parsed tree matches the original conversion semantically
    back.zip(want).foreach { case (b, w) =>
      assert(J.canonical(J.parse(b.json)) == J.canonical(J.parse(w.json)))
    }
  }

  test("spark.read.json multiLine with explicit GT schema; corrupt file lands in _corrupt_record") {
    val dir  = tmpDir("graft-json-ml")
    val docs = seeded(6)
    EvalJob.writeJsonDocDir(spark.createDataset(docs), dir)
    // one truncated (LLM-style) file among the goldens
    val corrupt = """{"document_details": {"format": "Itemized", "bill_no": "INV-9","""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "set-a", "doc_bad.json"), corrupt)

    // the reference's fixed GT sections as an explicit schema (billing is
    // dynamic-keyed and stays in the wholetext path)
    val schema = StructType(Seq(
      StructField("document_details", StructType(Seq(
        StructField("format", StringType), StructField("bill_no", StringType),
        StructField("provider_name", StringType)))),
      StructField("patient_information", StructType(Seq(
        StructField("full_name", StringType),
        StructField("identification_number", StringType),
        StructField("policy_no", StringType)))),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("multiLine", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/*/*.json")
      .cache()

    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() == 6)
    val bills = good.select("document_details.bill_no").as[String].collect().sorted
    assert(bills.toSeq == (0 until 6).map(i => f"INV-$i%06d"))

    val bad = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect()
    assert(bad.length == 1)
    // F13: the repair fallback recovers the truncated record
    val repaired = J.parse(Kernels.scala_.repairJson(bad.head))
    assert(Normalize.getCi(Normalize.getCi(repaired, "document_details").get, "bill_no")
      .contains(J.JStr("INV-9")))
    df.unpersist()
  }

  test("repairJson fixes fences, unquoted keys, trailing commas, truncation") {
    val cases = Seq(
      "```json\n{\"a\": 1}\n```"            -> """{"a": 1}""",
      """{a: 1, b: [1, 2,], }"""            -> """{"a": 1, "b": [1, 2] }""",
      """{"a": {"b": [1, 2"""               -> """{"a": {"b": [1, 2]}}""",
      """{"a": "unterminated str"""         -> """{"a": "unterminated str"}""",
      """{"a":"""                           -> """{"a": null}""")
    cases.foreach { case (in, want) =>
      assert(Kernels.scala_.repairJson(in) == want, s"input: $in")
      assert(J.parseOpt(Kernels.scala_.repairJson(in)).isDefined, s"unparseable: $in")
    }
    // well-formed input is untouched (note: repair is a FALLBACK — input
    // with `, word:` shapes inside string values never reaches it because
    // the strict parse already succeeded)
    val ok = """{"k": "plain value", "n": [1, 2]}"""
    assert(Kernels.scala_.repairJson(ok) == ok)
  }
}
