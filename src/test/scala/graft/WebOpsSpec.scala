package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the web-crawl operator family (WebOps) over
  * sf0.001. The exact cross-engine value check is the driver's DuckDB
  * oracle compare; here we pin the invariants a correct implementation
  * must satisfy independent of the second engine.
  */
class WebOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val dir = "/root/testdata/sf0.001"

  test("robots: longest prefix wins, /private denied, /private/open allowed on even hosts") {
    val out = SparkEntry.queries("q_robots_filter")(spark, dir).cache()
    // /page/* and / always match only the root allow rule
    assert(out.filter(col("path").startsWith("/page/") && !col("allowed")).count() == 0)
    // /private/doc* is denied everywhere (the /private rule beats root)
    assert(out.filter(col("path").startsWith("/private/doc") && col("allowed")).count() == 0)
    // /private/open/* flips per host parity: the allow exception exists on
    // even hosts only, so odd hosts fall back to the /private deny
    val openRows = out.filter(col("path").startsWith("/private/open/"))
    assert(openRows.filter((col("host") === "host0" || col("host") === "host2"
      || col("host") === "host4" || col("host") === "host6") && !col("allowed")).count() == 0)
    assert(openRows.filter((col("host") === "host1" || col("host") === "host3"
      || col("host") === "host5") && col("allowed")).count() == 0)
    // exactly one decision per URL
    assert(out.groupBy(col("doc_id")).count().filter(col("count") =!= 1).count() == 0)
    out.unpersist(); ()
  }

  test("anchor text: per-target top-3, counts ordered, hub target present") {
    val out = SparkEntry.queries("q_anchor_text")(spark, dir).cache()
    assert(out.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
    // rank 1's count >= rank 2's within each target
    val r1 = out.filter(col("rank") === 1).select(col("target"), col("cnt").as("c1"))
    val r2 = out.filter(col("rank") === 2).select(col("target"), col("cnt").as("c2"))
    assert(r1.join(r2, Seq("target")).filter(col("c1") < col("c2")).count() == 0)
    // every 3rd doc links to src0, so the hub must appear as a target
    assert(out.filter(col("target") === "src0").count() > 0)
    out.unpersist(); ()
  }

  test("mirror hosts: full mirror flagged, spun copy not") {
    val out = SparkEntry.queries("q_mirror_hosts")(spark, dir).cache()
    val full = out.filter(col("host_a") === "src3" && col("host_b") === "src3-mirror")
      .head()
    assert(full.getAs[Boolean]("is_mirror"))
    assert(full.getAs[Long]("shared") == full.getAs[Long]("na"))
    val spun = out.filter(col("host_a") === "src6" && col("host_b") === "src6-spun")
      .head()
    assert(!spun.getAs[Boolean]("is_mirror"))
    assert(spun.getAs[Long]("shared") < spun.getAs[Long]("nb"))
    out.unpersist(); ()
  }

  test("host boilerplate: planted header stripped, body preserved verbatim") {
    val out  = SparkEntry.queries("text_host_boilerplate")(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val j = out.join(docs.select(col("doc_id"), col("text")), Seq("doc_id")).cache()
    // the header never survives
    assert(j.filter(col("cleaned").contains("site nav menu links copyright")).count() == 0)
    // at least one line (the header) was stripped from every doc
    assert(j.filter(col("kept_lines") >= col("n_lines")).count() == 0)
    // the body is exactly the original token stream (nothing organic was
    // close to the 60% host threshold on this corpus)
    val bad = j.filter(
      split(trim(col("cleaned")), "\\s+") =!= split(trim(col("text")), "\\s+"))
    assert(bad.count() == 0, "cleaned body diverged from original tokens")
    j.unpersist(); ()
  }

  test("postings: blocks decode to sorted in-shard doc ids covering df") {
    val out = SparkEntry.queries("search_postings")(spark, dir).cache()
    // sum of block sizes per term == df
    assert(out.groupBy(col("term"), col("df")).agg(sum(col("block_n")).as("n"))
      .filter(col("n") =!= col("df")).count() == 0)
    // every block decodes (cumulative gap sum) to strictly increasing ids
    // inside its shard's doc range
    val rows = out.select(col("shard"), col("block_n"), col("gaps")).collect()
    rows.foreach { r =>
      val shard = r.getAs[Long]("shard")
      val gaps  = r.getAs[String]("gaps").split(",").map(_.toLong)
      assert(gaps.length == r.getAs[Long]("block_n"))
      val ids = gaps.scanLeft(0L)(_ + _).drop(1)
      assert(ids.head == gaps.head) // block head is absolute
      assert(ids.zip(ids.tail).forall { case (a, b) => a < b })
      assert(ids.forall(i => i >= shard * 128 && i < (shard + 1) * 128))
    }
    out.unpersist(); ()
  }

  test("warc parse: every record round-trips intact, uri carries host+id") {
    val out  = SparkEntry.queries("q_warc_parse")(spark, dir).cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(out.count() == docs.count())
    assert(out.filter(!col("intact")).count() == 0)
    assert(out.filter(col("content_length") =!= col("body_chars")).count() == 0)
    // uri = http://<source>/doc/<doc_id>, rebuilt from the source table
    val expect = docs.select(col("doc_id"),
      concat(lit("http://"), col("source"), lit("/doc/"),
        col("doc_id").cast("string")).as("uri"))
    assert(out.select(col("doc_id"), col("uri")).exceptAll(expect).count() == 0)
    out.unpersist(); ()
  }

  test("host minhash: sketch-merge similarity matches doc-level intuition") {
    val out = SparkEntry.queries("dedup_host_minhash")(spark, dir).cache()
    // 20 hosts -> 190 unordered pairs, ppm on the 1/8 grid
    assert(out.count() == 190)
    assert(out.filter(col("matches") < 0 || col("matches") > 8).count() == 0)
    assert(out.filter(col("est_jaccard_ppm") =!= col("matches") * 125000).count() == 0)
    out.unpersist(); ()
  }

  test("quality classifier: logit bounded by weight range, tokens match") {
    val out = SparkEntry.queries("text_quality_classifier")(spark, dir).cache()
    val tok = SparkEntry.queries("text_tokens")(spark, dir)
      .select(col("doc_id"), col("ws_tokens"))
    assert(out.join(tok, Seq("doc_id"))
      .filter(col("n_tokens") =!= col("ws_tokens")).count() == 0)
    // weights live in [-500, 499]
    assert(out.filter(abs(col("logit")) > col("n_tokens") * 500).count() == 0)
    assert(out.filter(col("keep") =!= (col("logit") >= 0)).count() == 0)
    out.unpersist(); ()
  }

  test("q_redirect_resolve: 6 doubling rounds land every chain on its closed-form terminal") {
    val out = SparkEntry.queries("q_redirect_resolve")(spark, dir).collect()
      .map(r => r.getAs[Long]("url_id") ->
        ((r.getAs[Long]("terminal_id"), r.getAs[Long]("hops")))).toMap
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.size == n)
    // the synthesized pointer map has closed-form resolution:
    // terminal = u - u%50, hops = u%50 (chains up to 49 > 2^5 — the
    // doubling genuinely needs all 6 rounds)
    out.foreach { case (u, (t, h)) =>
      assert(t == u - u % 50 && h == u % 50, s"url $u: got ($t, $h)")
    }
    assert(out.values.map(_._2).max >= 33L, "corpus too small to exercise round 6")
  }
}
