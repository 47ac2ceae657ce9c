package graft.streaming

import graft.Document
import graft.plans.{ExtractJob, LineageAccumulator, ManifestIO}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming front-end for the extraction pipeline.
  *
  * The reference is strictly request/response (no streams —
  * /root/reference/app.py:233-250 handles one document per HTTP call,
  * SURVEY.md §2.9), so the batch pipeline is the primary surface; this
  * wrapper is the incremental-ingest shape a production deployment bolts
  * on: a file-source stream of document-table parquet, each micro-batch
  * pushed through the SAME `ExtractJob.extract` kernel and the SAME
  * `ManifestIO` exactly-once commit.
  *
  * Delivery semantics are layered:
  *  - Spark's streaming checkpoint replays an unfinished micro-batch after
  *    a restart (same batchId);
  *  - within the replayed batch, `ManifestIO.write` (staging + atomic
  *    rename + manifest, namespaced per batchId) makes the re-execution
  *    idempotent — no duplicate spans, no lost buckets.
  *
  * Per-batch outputs land under `outDir/batch=<id>/` (each with its own
  * manifest namespace: manifests track buckets of ONE input set; separate
  * batches are separate input sets).
  */
object StreamingExtract {

  def start(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpointDir: String,
      nBuckets: Int,
      lineage: Option[LineageAccumulator] = None): StreamingQuery = {
    import spark.implicits._
    val process: (Dataset[Document], Long) => Unit = { (batch, batchId) =>
      val out = ExtractJob.extract(batch, numPartitions = nBuckets, lineage = lineage)
      ManifestIO.write(out, s"$outDir/batch=$batchId", nBuckets, runId = s"stream-$batchId")
    }
    spark.readStream
      .schema(Encoders.product[Document].schema)
      .option("maxFilesPerTrigger", 8) // bound micro-batch size: latency/throughput knob
      .parquet(inDir)
      .as[Document]
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(process)
      .start()
  }

  /** Read back everything extracted so far (all batches). */
  def readAll(spark: SparkSession, outDir: String): Dataset[Document] = {
    import spark.implicits._
    spark.read.parquet(s"$outDir/batch=*/data").drop("bucket").as[Document]
  }
}
