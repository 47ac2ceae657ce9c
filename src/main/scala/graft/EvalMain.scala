package graft

import graft.corpus.EvalCorpus
import graft.eval.{EvalJob, J, Normalize}
import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the field-level evaluation pipeline — the
  * distributed analog of the reference's eval run
  * (/root/reference/eval_script_field_level.py:482-512): golden⋈prediction
  * join → per-document diff → per-file metrics CSV → per-folder summary.
  *
  * Usage: graft.EvalMain <nDocs> <seed> <defectRate> <outDir>
  *
  * With defectRate 0 every prediction differs from its golden only by
  * tolerance-covered noise (case, whitespace, commas, ±0.005 shifts,
  * list order), so average accuracy MUST be exactly 1.0 — that invariant
  * is checked and the exit code reflects it.
  */
object EvalMain {
  def main(args: Array[String]): Unit = {
    val nDocs      = args.headOption.map(_.toLong).getOrElse(2000L)
    val seed       = if (args.length > 1) args(1).toLong else 42L
    val defectRate = if (args.length > 2) args(2).toDouble else 0.0
    val outDir     = if (args.length > 3) args(3) else "/tmp/graft-eval-out"

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-eval")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val parts = cpus.toInt * 2
    def folderOf(i: Long) = if (i % 2 == 0) "set-clean" else "set-defect"

    val goldens = spark.range(0, nDocs, 1, parts).map { i =>
      EvalJob.JsonDoc(f"doc_$i%08d", folderOf(i), J.canonical(EvalCorpus.groundTruth(i, seed)))
    }
    // clean folder: tolerance-covered noise only; defect folder: defectRate
    val preds = spark.range(0, nDocs, 1, parts).map { i =>
      val rate = if (folderOf(i) == "set-clean") 0.0 else defectRate
      EvalJob.JsonDoc(f"doc_$i%08d", folderOf(i), J.canonical(EvalCorpus.prediction(i, seed, rate)))
    }

    val metrics = EvalJob.evaluate(preds, goldens).cache()
    EvalJob.writeCsv(metrics.filter(_.folder == "set-clean"), s"$outDir/set-clean")
    EvalJob.writeCsv(metrics.filter(_.folder == "set-defect"), s"$outDir/set-defect")

    val summary = EvalJob.folderSummary(metrics).orderBy("folder").collect()
    summary.foreach { r =>
      println(s"""{"folder":"${r.getString(0)}","files":${r.getLong(1)},""" +
        s""""avg_accuracy":${r.getDouble(2)},"avg_schema":${r.getDouble(3)},"avg_values":${r.getDouble(4)}}""")
    }
    val cleanAcc = summary.find(_.getString(0) == "set-clean").map(_.getDouble(2)).getOrElse(0.0)
    spark.stop()
    if (cleanAcc != 1.0) { System.err.println(s"clean-set accuracy $cleanAcc != 1.0"); sys.exit(1) }
  }
}
