package graft

import graft.operators.Layout
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the table-layout planners (operators/Layout.scala). */
class LayoutSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("compaction bins respect the concat-and-cut size bound") {
    val plan = SparkEntry.queries("q_compaction_plan")(spark, dir).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val kb = r.getAs[Long]("kb_in")
      // a bin closes when cum crosses TargetKb; the overshoot is < one
      // small file, so kb_in < TargetKb + SmallKb always
      assert(kb < Layout.TargetKb + Layout.SmallKb, r.toString)
      assert(r.getAs[Long]("n_files") > 1, "1-file bins are no-op rewrites")
      assert(r.getAs[Long]("first_file") <= r.getAs[Long]("last_file"))
    }
  }

  test("Morton spread interleaves bits exactly") {
    // golden points of the 16->32 bit interleave: z(x,y) with x on even bits
    val pts = Seq((1L, 0L, 1L), (0L, 1L, 2L), (3L, 3L, 15L),
      (0xFFFFL, 0L, 0x55555555L), (0L, 0xFFFFL, 0xAAAAAAAAL),
      (0xFFFFL, 0xFFFFL, 0xFFFFFFFFL))
    val df = spark.createDataFrame(pts).toDF("x", "y", "want")
    val got = df.withColumn("z", Layout.mortonZ(col("x"), col("y")))
      .filter(col("z") =!= col("want")).collect()
    assert(got.isEmpty, got.mkString(", "))
  }

  test("z-order layout prunes a 2-D box at least as well as time-linear files") {
    val rows = SparkEntry.queries("q_zorder_layout")(spark, dir).collect()
    def scanned(layout: String): Long =
      rows.filter(r => r.getAs[String]("layout") == layout && r.getAs[Boolean]("scanned"))
        .map(_.getAs[Long]("n_rows")).sum
    assert(scanned("zorder") <= scanned("linear"),
      s"zorder=${scanned("zorder")} linear=${scanned("linear")}")
    // and the pruning is real: neither layout scans the whole table
    val total = rows.filter(_.getAs[String]("layout") == "zorder")
      .map(_.getAs[Long]("n_rows")).sum
    assert(scanned("zorder") < total)
  }

  test("two-pass global shuffle equals the naive global row_number") {
    val got = SparkEntry.queries("q_global_shuffle")(spark, dir)
    val n   = got.count()
    // permutation: positions are exactly 0..n-1
    assert(got.select(countDistinct(col("global_pos"))).head().getLong(0) == n)
    assert(got.agg(min("global_pos"), max("global_pos")).head() ===
      org.apache.spark.sql.Row(0L, n - 1L))
    // equality with the single-partition reference order
    val naive = got.select(col("doc_id"), col("pos_key"))
      .withColumn("want",
        row_number().over(Window.orderBy(col("pos_key"), col("doc_id"))).cast("long") - 1L)
    val joined = got.join(naive.select(col("doc_id"), col("want")), Seq("doc_id"))
    assert(joined.filter(col("global_pos") =!= col("want")).count() == 0)
  }

  test("rendezvous resharding moves docs ONLY to the new shard, at ~1/(n+1) churn") {
    val out = SparkEntry.queries("q_rendezvous_shards")(spark, dir).cache()
    try {
      val n = out.count()
      assert(n == 500)
      // ranges: before in [0, 16), after in [0, 17)
      assert(out.filter(col("shard_before") < 0 ||
        col("shard_before") >= Layout.RdvShards).count() == 0)
      assert(out.filter(col("shard_after") < 0 ||
        col("shard_after") > Layout.RdvShards).count() == 0)
      // THE theorem: argmax over a superset stays put or lands on the
      // added element — a moved doc's new home is shard 16, always
      assert(out.filter(col("moved") &&
        col("shard_after") =!= Layout.RdvShards).count() == 0)
      assert(out.filter(!col("moved") &&
        col("shard_before") =!= col("shard_after")).count() == 0)
      // churn is ~N/17 (md5 is fixed, so this is a deterministic value —
      // the band just documents the magnitude, vs mod-resharding's 16/17)
      val moved = out.filter(col("moved")).count()
      assert(moved > n / 34 && moved < n / 8,
        s"churn $moved/$n out of the N/17 band")
      // the 16-shard placement is balanced enough to be a real placement:
      // every shard is inhabited
      assert(out.select(countDistinct(col("shard_before"))).head().getLong(0) ==
        Layout.RdvShards)
    } finally { out.unpersist(); () }
  }
}
