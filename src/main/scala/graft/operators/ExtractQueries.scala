package graft.operators

import graft.plans.{ExtractJob, GoldenDiff}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The extraction pipeline exposed through the query surface. These are
  * not SQL-expressible (the kernel is a typed mapPartitions transform), so
  * they carry no DuckDB oracle — their correctness gate is the golden
  * span-sequence anti-join in the ScalaTest suite and ExtractMain --check;
  * here the driver gets a rows>0 smoke signal plus deterministic output
  * it can diff across rounds.
  */
object ExtractQueries {

  private val NDocs = 1000L
  private val Seed  = 7L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Extracted span rows for a seeded corpus: the flagship kernel output.
    "extract_spans" -> ((s, _) => {
      val parts = s.sparkContext.defaultParallelism
      val in    = ExtractJob.generateInputs(s, NDocs, Seed, parts)
      GoldenDiff.explodeSpans(ExtractJob.extract(in, numPartitions = parts))
    }),

    // North-rule verification as a query: per-doc golden equality flags.
    "extract_golden_match" -> ((s, _) => {
      val parts = s.sparkContext.defaultParallelism
      val out   = ExtractJob.extract(ExtractJob.generateInputs(s, NDocs, Seed, parts), parts)
      val bad   = GoldenDiff.diff(out, ExtractJob.generateGoldens(s, NDocs, Seed, parts))
        .select(col("doc_id")).distinct().withColumn("matches", lit(false))
      ExtractJob.generateGoldens(s, NDocs, Seed, parts).toDF()
        .select(col("doc_id"), size(col("spans")).cast("long").as("golden_spans"))
        .join(bad, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("golden_spans"), coalesce(col("matches"), lit(true)).as("matches"))
    }),

    // The reference's field-level evaluation (EP2) end-to-end on a seeded
    // golden/prediction corpus: per-folder accuracy summary.
    "eval_metrics" -> ((s, _) => {
      import s.implicits._
      val n = 200L
      val goldens = s.range(0, n, 1, 8).map { i =>
        graft.eval.EvalJob.JsonDoc(f"doc_$i%06d", if (i % 2 == 0) "set-clean" else "set-defect",
          graft.eval.J.canonical(graft.corpus.EvalCorpus.groundTruth(i, 11L)))
      }
      val preds = s.range(0, n, 1, 8).map { i =>
        val rate = if (i % 2 == 0) 0.0 else 0.15
        graft.eval.EvalJob.JsonDoc(f"doc_$i%06d", if (i % 2 == 0) "set-clean" else "set-defect",
          graft.eval.J.canonical(graft.corpus.EvalCorpus.prediction(i, 11L, rate)))
      }
      graft.eval.EvalJob.folderSummary(graft.eval.EvalJob.evaluate(preds, goldens))
    }))
}
