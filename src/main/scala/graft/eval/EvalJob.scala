package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed replica of the reference's field-level evaluation run
  * (EP2, /root/reference/eval_script_field_level.py:447-512): the
  * sequential per-file loop becomes a doc⋈golden join + a typed map.
  *
  * Scale design: predictions and goldens are both keyed by doc_id; the
  * join shuffles both sides once (or broadcasts the goldens if small —
  * Catalyst decides; at 10^12 docs goldens are NOT small, so the
  * sort-merge/shuffled-hash path is the real one and nothing here
  * assumes broadcastability). The per-document compare is intra-row
  * (arrays/JSON within one row) — no cross-row state, no second shuffle
  * until the folder-level aggregate.
  */
object EvalJob {

  /** One prediction or golden document: payload is its extraction record
    * as a JSON string (schema-fluid, like the reference's dicts). */
  final case class JsonDoc(doc_id: String, folder: String, json: String)

  /** Per-file metrics row — the reference's CSV row shape
    * (eval_script_field_level.py:415-445). */
  final case class MetricsRow(
      file: String, folder: String,
      accuracy: Double, schema_accuracy: Double, values_accuracy: Double,
      summary: String,
      missing_count: Int, missing_fields: String,
      mismatched_count: Int, mismatched_fields: String)

  /** Evaluate predictions against goldens. Inner join = the reference's
    * skip-if-no-golden (P2); per-file failures become error rows with
    * accuracy 0.0 instead of failing the job (:373-398). */
  def evaluate(preds: Dataset[JsonDoc], goldens: Dataset[JsonDoc]): Dataset[MetricsRow] = {
    val spark = preds.sparkSession
    import spark.implicits._
    preds.toDF("doc_id", "folder", "pred_json")
      .join(goldens.toDF("doc_id", "g_folder", "gt_json"), Seq("doc_id"))
      .select($"doc_id", $"folder", $"pred_json", $"gt_json")
      .as[(String, String, String, String)]
      .map { case (docId, folder, predJson, gtJson) =>
        try {
          val gtRaw  = Normalize.unwrapData(J.parse(gtJson))
          val gt     = Normalize.groundTruthToResponse(gtRaw)
          // strict parse, then the F13 json_repair fallback — the
          // reference's order (field_extractor_gemini.py:185-193)
          val pred = J.parseOpt(predJson)
            .orElse(J.parseOpt(graft.functions.Kernels.scala_.repairJson(predJson)))
            .collect { case o: J.JObj => o }
            .getOrElse(J.JObj(Vector.empty))
          val d = Compare.compareJson(gt, Normalize.unwrapData(pred))
          val m = Compare.metrics(d)
          MetricsRow(docId, folder, m.accuracy, m.schemaAccuracy, m.valuesAccuracy,
            "ok", m.missingCount, m.missingFields, m.mismatchedCount, m.mismatchedFields)
        } catch {
          case scala.util.control.NonFatal(e) =>
            MetricsRow(docId, folder, 0.0, 0.0, 0.0, s"extract_failed: ${e.getMessage}",
              0, "", 0, "")
        }
      }
  }

  /** Folder summary (eval_script_field_level.py:477-480, 495-512):
    * file count + 4-dp averages per folder. */
  def folderSummary(metrics: Dataset[MetricsRow]): DataFrame =
    metrics.groupBy(col("folder")).agg(
      count(lit(1)).as("files_evaluated"),
      round(avg(col("accuracy")), 4).as("average_accuracy"),
      round(avg(col("schema_accuracy")), 4).as("average_schema_accuracy"),
      round(avg(col("values_accuracy")), 4).as("average_values_accuracy"))

  /** Per-folder CSV sink with the reference's fixed header order
    * (eval_script_field_level.py:427-445). */
  def writeCsv(metrics: Dataset[MetricsRow], path: String): Unit =
    metrics
      .select("file", "accuracy", "schema_accuracy", "values_accuracy", "summary",
        "missing_count", "missing_fields", "mismatched_count", "mismatched_fields")
      .orderBy("file") // sorted(glob) determinism, :449
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S3 as the reference ships it: ONE JSON object per file under
    * `dir/<folder>/<doc_id>.json` (eval_script_field_level.py:90-92,449).
    * Distributed read: `wholetext` gives one row per file (never a
    * driver-side listing loop); doc_id = file stem, folder = parent dir.
    * At 10^12 docs one-file-per-doc is an ingest format, not a working
    * format — this reader is the boundary that turns it into a table. */
  def readJsonDocDir(spark: SparkSession, dir: String): Dataset[JsonDoc] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(s"$dir/*/*.json")
      .select(input_file_name().as("path"), col("value").as("json"))
      .select(
        regexp_extract(col("path"), "([^/]+)\\.json$", 1).as("doc_id"),
        regexp_extract(col("path"), "([^/]+)/[^/]+\\.json$", 1).as("folder"),
        col("json"))
      .as[JsonDoc]
  }

  /** Inverse of [[readJsonDocDir]]: one file per doc, written from the
    * executors (each task writes its partition's files — the per-file
    * sink is the reference's on-disk contract, convert_ground_truth.py:
    * 123-135, not a throughput path). */
  def writeJsonDocDir(ds: Dataset[JsonDoc], dir: String): Unit =
    ds.foreachPartition { (it: Iterator[JsonDoc]) =>
      it.foreach { d =>
        val p = java.nio.file.Paths.get(dir, d.folder, d.doc_id + ".json")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, d.json): Unit
      }
    }

  /** EP3 as a distributed transform: nested ground-truth JSON in,
    * converted flat JSON out (one pretty document per row — the
    * reference writes one file per input, convert_ground_truth.py:123-135). */
  def convertGroundTruths(gts: Dataset[JsonDoc]): Dataset[(String, String)] = {
    val spark = gts.sparkSession
    import spark.implicits._
    gts.map(d => d.doc_id -> J.pretty(Normalize.convertGroundTruth(J.parse(d.json))))
  }
}
