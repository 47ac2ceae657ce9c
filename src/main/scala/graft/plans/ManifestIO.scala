package graft.plans

import graft.Document
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Iceberg-semantics emulation on plain Parquet (SURVEY.md §7.6).
  *
  * The north rule names Iceberg for two properties: snapshot-idempotent
  * reruns and per-partition checkpoint manifests for resume-from-failure.
  * No Iceberg runtime jar exists in this sandbox (offline coursier), so
  * those semantics are implemented directly:
  *
  *  - output is bucketed by `pmod(hash(doc_id), nBuckets)`; each bucket is
  *    a parquet partition directory `data/bucket=<b>/`
  *  - a committed bucket is recorded as a JSON line in
  *    `_manifest/run-<runId>.json` with (bucket, docCount, spanCount,
  *    contentHash, status) — contentHash is an order-independent sum of
  *    per-document hashes, so equal content ⇒ equal hash regardless of
  *    task scheduling
  *  - resume = anti-join of input buckets vs committed buckets: a rerun
  *    (same input) finds every bucket committed and writes nothing
  *    (idempotent); a partially-failed run reprocesses only missing
  *    buckets (the reference's skip-and-continue/resume analog,
  *    eval_script_field_level.py:461-463)
  *
  * Behind an interface so a real Iceberg catalog can replace it where the
  * jar exists; callers only see write/read/committedBuckets.
  */
final case class BucketManifest(
    bucket: Int, docCount: Long, spanCount: Long, contentHash: Long, status: String)

object ManifestIO {

  private def manifestDir(outDir: String) = s"$outDir/_manifest"
  private def dataDir(outDir: String)     = s"$outDir/data"

  /** THE bucket function: every consumer (resume prune, kernel-stage
    * partitioning in fused mode, write distribution, manifests) must use
    * this one expression — a salt/bucketing change makes a different
    * table (manifests do not translate across it). */
  def bucketExpr(nBuckets: Int, salt: Int = 0) =
    pmod(hash(col("doc_id"), lit(salt)), lit(nBuckets))

  /** Scala twin of [[bucketExpr]] for kernel-side stats: the SAME engine
    * primitive (Catalyst's Murmur3, what the SQL `hash` compiles to) over
    * the same (doc_id, salt) chain, so there is one bucket function, not
    * two implementations. Pinned equal by ContentHashSpec. */
  def bucketValue(docId: String, nBuckets: Int, salt: Int = 0): Int = {
    import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
    import org.apache.spark.sql.types.{IntegerType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    // hash(doc_id, salt) = murmur3(salt, seed = murmur3(doc_id, seed = 42))
    val h1 = Murmur3HashFunction.hash(UTF8String.fromString(docId), StringType, 42L)
    val h2 = Murmur3HashFunction.hash(salt, IntegerType, h1).toInt
    ((h2 % nBuckets) + nBuckets) % nBuckets
  }

  def committedBuckets(spark: SparkSession, outDir: String): Set[Int] =
    readManifests(spark, outDir).filter(_.status == "committed").map(_.bucket).toSet

  // --- bucketing-parameter marker -----------------------------------------
  // Manifests record bucket IDS, which only mean anything under the
  // (nBuckets, salt) that produced them — and nBuckets derives from the
  // runtime core count, so a resume with a different SPARK_GRAFT_CPUS
  // would silently prune/skip docs whose NEW bucket id collides with an
  // OLD committed id. The table therefore carries a BUCKETING.json marker
  // written on first commit; every reader/writer of bucket ids checks it
  // and fails loudly on mismatch instead of mixing bucketings.

  private def bucketingPath(outDir: String) = Paths.get(manifestDir(outDir), "BUCKETING.json")

  private def readBucketing(outDir: String): Option[(Int, Int)] = {
    val p = bucketingPath(outDir)
    if (!Files.exists(p)) return None
    val kv = "\"(\\w+)\"\\s*:\\s*(-?\\d+)".r
      .findAllMatchIn(Files.readString(p))
      .map(m => m.group(1) -> m.group(2).toInt).toMap
    Some((kv("nBuckets"), kv("salt")))
  }

  /** Fail-loud guard: the caller's (nBuckets, salt) must match the table's
    * marker. A manifested table WITHOUT a marker (written by a pre-marker
    * version) is also rejected — its bucketing is unknowable. */
  def checkBucketing(outDir: String, nBuckets: Int, salt: Int): Unit =
    readBucketing(outDir) match {
      case Some((n, s)) if n != nBuckets || s != salt =>
        throw new IllegalStateException(
          s"output table $outDir was bucketed with (nBuckets=$n, salt=$s); " +
            s"this run uses (nBuckets=$nBuckets, salt=$salt) — bucket ids do not " +
            "translate across bucketings. Rerun with the original parameters " +
            "(e.g. the original SPARK_GRAFT_CPUS) or write to a fresh directory.")
      case Some(_) => ()
      case None if Files.isDirectory(Paths.get(manifestDir(outDir))) &&
          readManifests(null, outDir).nonEmpty =>
        throw new IllegalStateException(
          s"output table $outDir has committed manifests but no BUCKETING.json " +
            "marker — its bucketing parameters are unknown; refusing to resume.")
      case None => ()
    }

  /** First-writer-wins marker creation. CREATE_NEW (atomic create-or-fail)
    * instead of exists-check-then-write: two concurrent first writers with
    * DIFFERENT (nBuckets, salt) would both pass the exists check and one
    * marker would silently lose, leaving the losing writer committing
    * manifests under a bucketing that contradicts the recorded marker. The
    * loser instead re-reads the marker and re-runs the mismatch check —
    * failing loudly if its parameters disagree with the winner's. */
  private def writeBucketingMarker(outDir: String, nBuckets: Int, salt: Int): Unit = {
    val p = bucketingPath(outDir)
    if (Files.exists(p)) return
    Files.createDirectories(p.getParent)
    try
      Files.write(p, s"""{"nBuckets":$nBuckets,"salt":$salt}""".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        checkBucketing(outDir, nBuckets, salt)
    }
  }

  def readManifests(spark: SparkSession, outDir: String): Seq[BucketManifest] = {
    val dir = Paths.get(manifestDir(outDir))
    if (!Files.isDirectory(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala.filter(_.toString.endsWith(".json")).flatMap { p =>
      Files.readAllLines(p, StandardCharsets.UTF_8).asScala.flatMap(parseLine)
    }.toSeq
  }

  // fixed-shape JSON lines, hand-rolled to stay dependency-free
  private def parseLine(line: String): Option[BucketManifest] = {
    val kv = "\"(\\w+)\"\\s*:\\s*(\"[^\"]*\"|-?\\d+)".r
      .findAllMatchIn(line)
      .map(m => m.group(1) -> m.group(2).stripPrefix("\"").stripSuffix("\""))
      .toMap
    try Some(BucketManifest(
      kv("bucket").toInt, kv("docCount").toLong, kv("spanCount").toLong,
      kv("contentHash").toLong, kv("status")))
    catch { case _: Exception => None }
  }

  private def render(m: BucketManifest): String =
    s"""{"bucket":${m.bucket},"docCount":${m.docCount},"spanCount":${m.spanCount},""" +
      s""""contentHash":${m.contentHash},"status":"${m.status}"}"""

  /** Resume-prune: drop documents whose bucket is already committed.
    * Bucket is a function of `doc_id` alone, so this runs on the INPUT
    * side — committed buckets never reach the (expensive) extraction
    * kernel at all. This is the real resume semantics: skip the work,
    * not just the write. */
  def pruneCommitted(docs: Dataset[Document], outDir: String, nBuckets: Int,
      salt: Int = 0): Dataset[Document] = {
    checkBucketing(outDir, nBuckets, salt)
    val done = committedBuckets(docs.sparkSession, outDir)
    if (done.isEmpty) docs
    else docs.filter(!bucketExpr(nBuckets, salt).isin(done.toSeq: _*))
  }

  /** Buckets whose data directory exists under `data/` (complete by the
    * rename-after-complete invariant), regardless of manifest state. */
  private def bucketsOnDisk(outDir: String): Set[Int] = {
    val d = Paths.get(dataDir(outDir))
    if (!Files.isDirectory(d)) return Set.empty
    import scala.jdk.CollectionConverters._
    Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("bucket=") => s.stripPrefix("bucket=").toInt }
      .toSet
  }

  /** Write `docs` into the bucketed table, skipping already-committed
    * buckets. Returns the manifests committed by THIS run (empty on a
    * clean rerun). `runId` must be caller-supplied and unique per attempt.
    *
    * Exactly-once protocol (Iceberg-snapshot emulation):
    *  1. uncommitted input buckets are written to `_staging/<runId>/`
    *     (the ONLY execution of the upstream plan — manifest stats come
    *     from reading BACK the columnar output, never from re-running the
    *     plan, which would double lineage accumulators and cost)
    *  2. each staged bucket dir is atomically renamed into
    *     `data/bucket=<b>` — rename happens only after the full staging
    *     write succeeded, so a bucket dir under data/ is always complete
    *  3. manifest lines are appended last
    * A crash between 2 and 3 leaves complete-but-unmanifested "orphan"
    * buckets; the next run ADOPTS them (recommits the manifest from
    * read-back stats) instead of reprocessing — no duplicates, no lost
    * work. A crash during 1 leaves only staging garbage, ignored forever.
    */
  def write(docs: Dataset[Document], outDir: String, nBuckets: Int, runId: String,
      salt: Int = 0, prePartitioned: Boolean = false,
      statsSource: Option[BucketStatsAccumulator] = None): Seq[BucketManifest] = {
    val spark = docs.sparkSession
    checkBucketing(outDir, nBuckets, salt)
    writeBucketingMarker(outDir, nBuckets, salt)
    val done    = committedBuckets(spark, outDir)
    val orphans = bucketsOnDisk(outDir) -- done

    val bucketed = docs.toDF()
      .withColumn("bucket", bucketExpr(nBuckets, salt))
    val skip = done ++ orphans
    val todo = if (skip.isEmpty) bucketed
               else bucketed.filter(!col("bucket").isin(skip.toSeq: _*))

    // 1. stage (single execution of the upstream plan). Repartition ON THE
    // BUCKET KEY first so each bucket is written by exactly one task: one
    // parquet file per bucket instead of tasks×buckets tiny files (which,
    // on a local FS, also exec's a chmod per file — a measured 10x commit
    // slowdown; on HDFS/S3 it is the classic small-files explosion).
    // This write-side shuffle is the Iceberg "hash write-distribution"
    // shape. With prePartitioned=true the caller guarantees the rows are
    // ALREADY distributed by bucketExpr(nBuckets, salt) — i.e. the kernel
    // stage itself partitioned on the bucket key (ExtractMain's fused
    // single-shuffle mode) — and the second full-document shuffle is
    // skipped: each task still holds whole buckets, so partitionBy keeps
    // one file per bucket.
    val timing = sys.env.contains("GRAFT_PHASE_TIMING")
    def phase[A](name: String)(body: => A): A =
      if (!timing) body
      else {
        val t0 = System.nanoTime(); val r = body
        System.err.println(f"[phase] $name%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }

    val staging = s"$outDir/_staging/$runId"
    val distributed = if (prePartitioned) todo else todo.repartition(nBuckets, col("bucket"))
    phase("stage") {
      distributed
        .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(staging)
    }

    // 2. atomic per-bucket publication
    Files.createDirectories(Paths.get(dataDir(outDir)))
    import scala.jdk.CollectionConverters._
    val published = phase("publish") {
      val stagedBuckets = Files.list(Paths.get(staging)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket=")).toSeq
      stagedBuckets.flatMap { src =>
        val b   = src.getFileName.toString.stripPrefix("bucket=").toInt
        val dst = Paths.get(dataDir(outDir), s"bucket=$b")
        try { Files.move(src, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE); Some(b) }
        catch { case _: java.nio.file.FileSystemException => None } // already published
      }
    }

    // 3. commit manifests for newly published + adopted orphan buckets.
    // Newly-published bucket stats come from the kernel-pass accumulator
    // when the caller supplied one (read AFTER the staging action above) —
    // zero extra scans, the Iceberg writer-metrics shape. Orphans are
    // ALWAYS read back from disk: their content is a previous run's write,
    // and the manifest must describe what is on disk, not what this run's
    // input would produce. Both paths produce the same contentHash by
    // construction (ContentHash.docHash vs ContentHash.hashCol hash the
    // same canonical string with the same engine primitive).
    val toCommit  = published.toSet ++ orphans
    val accStats  = statsSource.map(_.value).getOrElse(Map.empty)
    val fromAcc   = published.filter(accStats.contains).map { b =>
      val s = accStats(b); BucketManifest(b, s.docs, s.spans, s.hash, "committed")
    }
    val readBack  = toCommit -- fromAcc.map(_.bucket)
    val stats = phase("stats") {
      (if (readBack.isEmpty) Seq.empty[BucketManifest]
       else {
        import spark.implicits._
        spark.read.parquet(dataDir(outDir))
          .filter(col("bucket").isin(readBack.toSeq: _*))
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("docCount"),
            sum(coalesce(size(col("spans")), lit(0))).as("spanCount"),
            // XOR-fold: commutative, overflow-free (ANSI mode) content hash
            bit_xor(ContentHash.hashCol).as("contentHash"))
          .as[(Int, Long, Long, Long)]
          .collect() // one tiny row per bucket — bounded by nBuckets, not by data
          .map { case (b, d, s, h) => BucketManifest(b, d, s, h, "committed") }
          .toSeq
      }) ++ fromAcc
    }
    if (stats.nonEmpty) {
      val dir = Paths.get(manifestDir(outDir))
      Files.createDirectories(dir)
      val body = stats.map(render).mkString("", "\n", "\n")
      Files.write(dir.resolve(s"run-$runId.json"), body.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    // staging leftovers (empty dir or skipped duplicates) are dead weight
    deleteRecursively(Paths.get(s"$outDir/_staging/$runId"))
    stats
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  def read(spark: SparkSession, outDir: String): Dataset[Document] = {
    import spark.implicits._
    spark.read.parquet(dataDir(outDir)).drop("bucket").as[Document]
  }
}
