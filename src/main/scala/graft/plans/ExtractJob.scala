package graft.plans

import graft.{Document, Span, SpanRow}
import graft.extract.Extract
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.AccumulatorV2

import scala.collection.concurrent.TrieMap

/** Per-partition lineage + throughput metrics (BASELINE.json north_rule:
  * "per-partition lineage + throughput metrics via custom Spark
  * accumulators"). Merge-commutative map: partitionId -> (docs, spans,
  * errors, nanos). The reference's analog is its per-request INFO logging
  * (/root/reference/app.py:235). */
final case class PartitionStats(docs: Long, spans: Long, errors: Long, nanos: Long) {
  def +(o: PartitionStats): PartitionStats =
    PartitionStats(docs + o.docs, spans + o.spans, errors + o.errors, nanos + o.nanos)
}

final class LineageAccumulator
    extends AccumulatorV2[(Int, PartitionStats), Map[Int, PartitionStats]] {
  private val m = TrieMap.empty[Int, PartitionStats]
  override def isZero: Boolean = m.isEmpty
  override def copy(): LineageAccumulator = {
    val c = new LineageAccumulator; m.foreach { case (k, v) => c.m.put(k, v) }; c
  }
  override def reset(): Unit = m.clear()
  override def add(v: (Int, PartitionStats)): Unit =
    m.updateWith(v._1) { prev => Some(prev.fold(v._2)(_ + v._2)) }
  override def merge(other: AccumulatorV2[(Int, PartitionStats), Map[Int, PartitionStats]]): Unit =
    other.value.foreach { case (k, v) => add((k, v)) }
  override def value: Map[Int, PartitionStats] = m.toMap
}

/** Per-BUCKET write stats, accumulated inside the kernel pass itself:
  * bucket -> (docs, spans, contentHash-XOR). This is how manifest stats
  * are produced WITHOUT a read-back scan of the written output — the same
  * shape Iceberg gets from its writer's per-file metrics. XOR-fold is
  * commutative, so task scheduling order cannot change the value; the
  * accumulator rides the write action (a result stage), where Spark
  * applies each successful task's updates exactly once. */
final case class BucketStats(docs: Long, spans: Long, hash: Long) {
  def +(o: BucketStats): BucketStats =
    BucketStats(docs + o.docs, spans + o.spans, hash ^ o.hash)
}

final class BucketStatsAccumulator
    extends AccumulatorV2[(Int, BucketStats), Map[Int, BucketStats]] {
  private val m = TrieMap.empty[Int, BucketStats]
  override def isZero: Boolean = m.isEmpty
  override def copy(): BucketStatsAccumulator = {
    val c = new BucketStatsAccumulator; m.foreach { case (k, v) => c.m.put(k, v) }; c
  }
  override def reset(): Unit = m.clear()
  override def add(v: (Int, BucketStats)): Unit =
    m.updateWith(v._1) { prev => Some(prev.fold(v._2)(_ + v._2)) }
  override def merge(other: AccumulatorV2[(Int, BucketStats), Map[Int, BucketStats]]): Unit =
    other.value.foreach { case (k, v) => add((k, v)) }
  override def value: Map[Int, BucketStats] = m.toMap
}

/** The end-to-end extraction job: salted repartition → one narrow
  * mapPartitions stage running [[graft.extract.Extract]].
  *
  * Scale notes (designed for 10^12 docs / 1000 executors, tested on
  * local[32]):
  *  - `repartition(hash(doc_id))` with an explicit partition count defuses
  *    mega-document skew: documents land by uniform hash, not by input
  *    file order, so one parquet file of mega-docs cannot pin one task.
  *    The salt column is derived (hash of doc_id + salt literal), never
  *    stored.
  *  - exactly ONE shuffle in the whole job; extraction itself is narrow.
  *  - per-document try/catch: a poison document yields an error-tagged
  *    empty output instead of failing the stage (the reference's
  *    skip-and-continue policy, eval_script_field_level.py:373-398).
  */
object ExtractJob {

  def extract(
      docs: Dataset[Document],
      numPartitions: Int,
      salt: Int = 0,
      lineage: Option[LineageAccumulator] = None,
      partitionExpr: Option[org.apache.spark.sql.Column] = None,
      // (accumulator, nBuckets, bucketSalt): per-bucket manifest stats
      // computed in THIS pass — spares ManifestIO.write its read-back scan
      bucketStats: Option[(BucketStatsAccumulator, Int, Int)] = None): Dataset[Document] = {
    import docs.sparkSession.implicits._
    docs
      .repartition(numPartitions, partitionExpr.getOrElse(hash(col("doc_id"), lit(salt))))
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        def record(out: Document): Document = {
          bucketStats.foreach { case (acc, nBuckets, bSalt) =>
            acc.add((ManifestIO.bucketValue(out.doc_id, nBuckets, bSalt),
              BucketStats(1, out.spans.size.toLong, ContentHash.docHash(out))))
          }
          out
        }
        it.map { doc =>
          val t0 = System.nanoTime()
          try {
            val out = Extract.document(doc)
            lineage.foreach(_.add((pid, PartitionStats(1, out.spans.size.toLong, 0, System.nanoTime() - t0))))
            record(out)
          } catch {
            case scala.util.control.NonFatal(_) =>
              lineage.foreach(_.add((pid, PartitionStats(1, 0, 1, System.nanoTime() - t0))))
              record(Document(doc.doc_id, Seq.empty))
          }
        }
      }
  }

  /** Distributed corpus materialization: pure function of (idx, seed), no
    * driver-side data — the only generation pattern valid at 10^12 docs. */
  def generateInputs(spark: SparkSession, n: Long, seed: Long, parts: Int): Dataset[Document] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map(i => graft.corpus.Corpus.input(i, seed))
  }

  def generateGoldens(spark: SparkSession, n: Long, seed: Long, parts: Int): Dataset[Document] = {
    import spark.implicits._
    spark.range(0, n, 1, parts).map(i => graft.corpus.Corpus.golden(i, seed))
  }
}

/** Golden-file verification: span-sequence equality per doc_id via a
  * Dataset anti-join diff (BASELINE.json north_rule; reference precedent:
  * per-document golden JSON diffing, eval_script_field_level.py:208-288).
  * Order is part of the contract, so the join key includes the span's
  * position (`pos` from posexplode). */
object GoldenDiff {

  /** Explode a docs table to one row per (doc_id, pos, kind, text,
    * media_ref). `pos` is the array index — the reading-order rank.
    * Non-outer explode: an empty doc contributes no rows (null join keys
    * would never equate under SQL anti-join semantics); empty-vs-nonempty
    * mismatches are still caught by the nonempty side's rows. */
  def explodeSpans(docs: Dataset[Document]): DataFrame =
    docs.select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), col("s.kind"),
        coalesce(col("s.text"), lit("")).as("text"),
        coalesce(col("s.media_ref"), lit("")).as("media_ref"))

  private val keys = Seq("doc_id", "pos", "kind", "text", "media_ref")

  /** Symmetric diff: rows present on exactly one side. Empty ⇔ extraction
    * matches goldens exactly (100% span-sequence equality). Both legs are
    * anti-joins, so Catalyst plans them as hash anti-joins (broadcast when
    * one side is small, shuffled otherwise — correct at any scale). */
  def diff(extracted: Dataset[Document], goldens: Dataset[Document]): DataFrame = {
    val e = explodeSpans(extracted)
    val g = explodeSpans(goldens)
    // BOTH sides scale with the corpus, so neither may broadcast — but the
    // goldens are a typed range().map() dataset whose size Catalyst
    // estimates from the 8-byte-per-row range (~1.6 MB at 200k docs), so
    // without a hint the planner BROADCASTS the exploded golden span
    // table (~1 GB of real rows at 200k docs: the build side is collected
    // to the driver and the check dies on spark.driver.maxResultSize —
    // found by the 200k `--check` run; 100k sat just under the limit).
    // The merge hint forces sort-merge anti-joins: both sides shuffle and
    // SORT, which spills gracefully — shuffle_hash was tried and OOMs
    // building 32 concurrent in-memory maps of span-text partitions
    // (mega-doc spans make partition bytes >> row-count estimates).
    val missing = g.join(e.hint("merge"), keys, "left_anti")
      .withColumn("side", lit("missing"))
    val extra   = e.join(g.hint("merge"), keys, "left_anti")
      .withColumn("side", lit("extra"))
    missing.unionByName(extra)
  }

  /** Doc-level equality summary: (docs_total, docs_matching). Cheaper than
    * the full diff when only the rate is needed. */
  def matchRate(extracted: Dataset[Document], goldens: Dataset[Document]): (Long, Long) = {
    val d     = diff(extracted, goldens)
    val total = goldens.count()
    val bad   = d.select("doc_id").distinct().count()
    (total, total - bad)
  }
}
