package graft

import java.sql.Timestamp

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{SpanEvent, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

/** Event-time semantics of the streaming operators, driven through
  * MemoryStream micro-batches so watermark movement is deterministic:
  * results appear exactly when the watermark passes a window end / a
  * session's timeout, never earlier. */
class StreamingOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // base offset keeps every event strictly above the initial watermark
  // (epoch 0) — a row AT the watermark is dropped as late by stateful ops
  private def ts(min: Long): Timestamp = new Timestamp((min + 1000) * 60000L)

  test("windowedKindCounts emits a window only after the watermark passes it") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[SpanEvent]
    val q = StreamingOps.windowedKindCounts(in.toDS())
      .writeStream.format("memory").queryName("wkc").outputMode("append").start()
    try {
      // two windows: [0,5) and [5,10)
      in.addData(SpanEvent(ts(1), "d1", "text"), SpanEvent(ts(2), "d1", "text"),
        SpanEvent(ts(6), "d2", "image"))
      q.processAllAvailable()
      assert(spark.table("wkc").count() == 0) // watermark still behind both windows
      // sentinel far in the future: watermark = 60 - 10 > both window ends
      in.addData(SpanEvent(ts(60), "d9", "text"))
      q.processAllAvailable()
      val rows = spark.table("wkc")
        .select("window_start", "kind", "n_spans").as[(Timestamp, String, Long)]
        .collect().sortBy(r => (r._1.getTime, r._2))
      assert(rows.toSeq == Seq((ts(0), "text", 2L), (ts(5), "image", 1L)))
    } finally q.stop()
  }

  test("dedupStream drops in-watermark duplicates, expires state past the watermark") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val q = StreamingOps.dedupStream(
        in.toDF().toDF("event_time", "doc_id", "text"), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("ddw").outputMode("append").start()
    try {
      // same content under two doc_ids inside the watermark → one survivor
      in.addData((ts(0), "a1", "same text"), (ts(1), "a2", "same text"),
        (ts(1), "b1", "other text"))
      q.processAllAvailable()
      assert(spark.table("ddw").count() == 2)
      // advance watermark far past ts(1): the "same text" state expires…
      in.addData((ts(200), "c1", "third text"))
      q.processAllAvailable()
      // …so a copy arriving with a fresh event time is NOT deduped
      in.addData((ts(201), "a3", "same text"))
      q.processAllAvailable()
      val ids = spark.table("ddw").select("doc_id").as[String].collect().toSet
      assert(ids == Set("a1", "b1", "c1", "a3"))
    } finally q.stop()
  }

  test("sessionize absorbs in-watermark late events consistently with the batch twin") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[UserEvent]
    // gap 30 min, watermark 120 min so late arrivals stay processable
    val q = StreamingOps.sessionize(in.toDS(), gapMs = 30L * 60000,
        watermarkDelay = "120 minutes")
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    try {
      // batch 1 opens session [50, 55] for user 1
      in.addData(UserEvent(1, ts(50)), UserEvent(1, ts(55)))
      q.processAllAvailable()
      // batch 2: a late event at 30 (within gap of start 50) must LOWER
      // session_start; 75/77 extend forward normally (75-55 = 20 <= gap)
      in.addData(UserEvent(1, ts(30)), UserEvent(1, ts(75)), UserEvent(1, ts(77)))
      q.processAllAvailable()
      // batch 3: late events at -15/-10 (in-watermark: wm = 77-120) are
      // > gap before start 30: they merge with EACH OTHER, not with the
      // open session. They must NOT emit yet — the watermark (-43) is
      // still below their last+gap (20), so an in-watermark bridge (e.g.
      // ts(5)) could still fuse them with the open session
      in.addData(UserEvent(1, ts(-15)), UserEvent(1, ts(-10)))
      q.processAllAvailable()
      assert(spark.table("sess_late").isEmpty, "emitted before the watermark finalized it")
      // flush via timeout: both retained sessions emit — [-15,-10] and
      // [30, 77] with 5 events, exactly what batch q_sessionize produces
      in.addData(UserEvent(2, ts(500)))
      q.processAllAvailable()
      in.addData(UserEvent(2, ts(501))) // extra batch so the timeout fires
      q.processAllAvailable()
      val all = spark.table("sess_late").as[StreamingOps.Session].collect().toSeq
      assert(all.contains(StreamingOps.Session(1, ts(-15), ts(-10), 2)), all.toString)
      assert(all.contains(StreamingOps.Session(1, ts(30), ts(77), 5)), all.toString)
    } finally q.stop()
  }

  test("sessionize merges a cross-batch BRIDGE event into an already-closed session") {
    // The retraction trap buffered emission exists for: watermarkDelay
    // (10 min) < gap (30 min), batch 1 = {t=0, t=33} (33 - 0 > gap ⇒ two
    // intervals), batch 2 = {t=28} — in-watermark (wm = 33 - 10 = 23 < 28)
    // and within a gap of BOTH (28-0 ≤ 30, 33-28 ≤ 30): the batch twin
    // makes ONE session [0, 33]. Eager closed-by-successor emission would
    // have already emitted [0, 0] and could not retract it.
    implicit val sc = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StreamingOps.sessionize(in.toDS(), gapMs = 30L * 60000,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_bridge").outputMode("append").start()
    try {
      in.addData(UserEvent(1, ts(0)), UserEvent(1, ts(33)))
      q.processAllAvailable()
      assert(spark.table("sess_bridge").isEmpty, "closed-by-successor emitted eagerly")
      in.addData(UserEvent(1, ts(28))) // the bridge
      q.processAllAvailable()
      // flush: watermark far past 33 + 30
      in.addData(UserEvent(2, ts(500)))
      q.processAllAvailable()
      in.addData(UserEvent(2, ts(501)))
      q.processAllAvailable()
      val u1 = spark.table("sess_bridge").as[StreamingOps.Session]
        .collect().toSeq.filter(_.user_id == 1)
      assert(u1 == Seq(StreamingOps.Session(1, ts(0), ts(33), 3)), u1.toString)
    } finally q.stop()
  }

  test("sessionize closes sessions by successor-gap and by event-time timeout") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StreamingOps.sessionize(in.toDS(), gapMs = 30L * 60000)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session)…
      in.addData(UserEvent(1, ts(0)), UserEvent(1, ts(5)))
      q.processAllAvailable()
      // …then an event 90 min later: closes session 1 immediately
      in.addData(UserEvent(1, ts(95)))
      q.processAllAvailable()
      val afterSuccessor = spark.table("sess")
        .as[StreamingOps.Session].collect().toSeq
      assert(afterSuccessor == Seq(StreamingOps.Session(1, ts(0), ts(5), 2)))
      // sentinel user advances the watermark past 95 + 30 + delay:
      // user 1's idle session times out and is emitted
      in.addData(UserEvent(2, ts(200)))
      q.processAllAvailable()
      in.addData(UserEvent(2, ts(201))) // extra batch so the timeout fires
      q.processAllAvailable()
      val all = spark.table("sess").as[StreamingOps.Session]
        .collect().sortBy(_.session_start.getTime).toSeq
      assert(all.contains(StreamingOps.Session(1, ts(95), ts(95), 1)), all.toString)
    } finally q.stop()
  }

  test("asofJoin honors a matching view that arrives a micro-batch AFTER its click") {
    // The case a time-sorted replay cannot produce: click at t=20 lands in
    // batch 1; its true match (view t=15, in-watermark) arrives in batch 2.
    // Eager emission would have matched the click to view t=0; the
    // watermark-gated pending buffer must hold the click until its match
    // set freezes.
    import StreamingOps.{AsofMatch, TaggedEvent}
    implicit val sc = spark.sqlContext
    val in = MemoryStream[TaggedEvent]
    val q = StreamingOps.asofJoin(in.toDS(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    try {
      def us(min: Long): Long = ts(min).getTime * 1000
      in.addData(TaggedEvent(1, ts(0), 0, 100), TaggedEvent(1, ts(20), 1, 200))
      q.processAllAvailable()
      // watermark = 20 - 10 = 10 < 20: the click must still be pending
      assert(spark.table("asof").isEmpty, "click emitted before its match set froze")
      in.addData(TaggedEvent(1, ts(15), 0, 101)) // in-watermark late view
      q.processAllAvailable()
      // click for a user with NO views, plus watermark advance + timeout fire
      in.addData(TaggedEvent(2, ts(100), 1, 300))
      q.processAllAvailable()
      in.addData(TaggedEvent(3, ts(500), 0, 999))
      q.processAllAvailable()
      in.addData(TaggedEvent(3, ts(501), 0, 998))
      q.processAllAvailable()
      val rows = spark.table("asof").as[AsofMatch].collect().sortBy(_.click_id).toSeq
      assert(rows == Seq(
        AsofMatch(1, 200, Some(101L), Some(us(20) - us(15))),
        AsofMatch(2, 300, None, None)), rows.toString)
    } finally q.stop()
  }

  test("asofJoin retains only the dominating view at-or-below the watermark") {
    import StreamingOps.{AsofMatch, TaggedEvent}
    implicit val sc = spark.sqlContext
    val in = MemoryStream[TaggedEvent]
    val q = StreamingOps.asofJoin(in.toDS(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("asof2").outputMode("append").start()
    try {
      // three old views; after the watermark passes them only v=102 (the
      // latest) may be retained — and it must still match a later click
      in.addData(TaggedEvent(1, ts(0), 0, 100), TaggedEvent(1, ts(1), 0, 101),
        TaggedEvent(1, ts(2), 0, 102))
      q.processAllAvailable()
      in.addData(TaggedEvent(1, ts(300), 0, 103)) // advance watermark far past
      q.processAllAvailable()
      in.addData(TaggedEvent(1, ts(305), 1, 200)) // click: latest ≤ is 103
      q.processAllAvailable()
      in.addData(TaggedEvent(1, ts(400), 0, 104))
      q.processAllAvailable()
      in.addData(TaggedEvent(1, ts(401), 0, 105))
      q.processAllAvailable()
      val rows = spark.table("asof2").as[AsofMatch].collect().toSeq
      assert(rows.map(r => (r.click_id, r.view_id)) == Seq((200L, Some(103L))), rows.toString)
    } finally q.stop()
  }

  test("nearDedupStream flags a copy across a batch boundary, not the original") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0   = new Timestamp(86400L * 1000)
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val in   = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingOps.nearDedupStream(in.toDF().toDF("event_time", "doc_id", "text"))
      .writeStream.format("memory").queryName("ndup1").outputMode("append").start()
    try {
      // batch 1: two unrelated docs
      in.addData((t0, 1L, text), (t0, 2L, "completely different words with no shared shingles at all here"))
      q.processAllAvailable()
      // batch 2: a near-dup of doc 1 (one appended token) + a fresh doc
      in.addData((t0, 3L, text + " zzz"), (t0, 4L, "yet another novel document body nothing like the others present"))
      q.processAllAvailable()
      val verdict = spark.table("ndup1")
        .groupBy(col("doc_id")).agg(expr("bool_or(seen)").as("dup"))
        .as[(Long, Boolean)].collect().toMap
      assert(verdict(1L) === false)
      assert(verdict(2L) === false)
      assert(verdict(3L) === true, "copy arriving a batch later must hit the stored band keys")
      assert(verdict(4L) === false)
    } finally q.stop()
  }

  test("nearDedupStream resolves within-batch order by doc_id, lower id wins") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0   = new Timestamp(86400L * 1000)
    val text = "one shared document body repeated verbatim across two ids in one batch"
    val in   = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingOps.nearDedupStream(in.toDF().toDF("event_time", "doc_id", "text"))
      .writeStream.format("memory").queryName("ndup2").outputMode("append").start()
    try {
      in.addData((t0, 8L, text), (t0, 5L, text)) // same batch, out of order
      q.processAllAvailable()
      val verdict = spark.table("ndup2")
        .groupBy(col("doc_id")).agg(expr("bool_or(seen)").as("dup"))
        .as[(Long, Boolean)].collect().toMap
      assert(verdict(5L) === false, "the lower id is the keeper")
      assert(verdict(8L) === true)
    } finally q.stop()
  }

  test("rateLimit: bucket drains, refills by event time, state survives batch boundaries") {
    import StreamingOps.{FetchDecision, FetchReq}
    implicit val sq = spark.sqlContext
    val H  = 7L
    val S  = 1000000L // one token in micro-tokens
    val in = MemoryStream[FetchReq]
    val q = StreamingOps.rateLimit(in.toDS())
      .writeStream.format("memory").queryName("rlim").outputMode("update").start()
    try {
      // batch 1: simultaneous burst of 3 (event_id order) — cap is 2
      // tokens, third denied with an empty bucket
      in.addData(FetchReq(H, 0L, 1L), FetchReq(H, 0L, 2L), FetchReq(H, 0L, 3L))
      q.processAllAvailable()
      // batch 2 (state carry): at t=+3 h only half a token refilled →
      // denied (balance kept); 6 h later that half plus a full token → admit
      val h3 = 3L * 3600 * 1000000L
      in.addData(FetchReq(H, h3, 4L), FetchReq(H, 3 * h3, 5L))
      q.processAllAvailable()
      val d = spark.table("rlim").as[FetchDecision].collect()
        .map(r => r.event_id -> ((r.tok_before_mu, r.allowed))).toMap
      assert(d(1L) == ((2 * S, true)))
      assert(d(2L) == ((S, true)))
      assert(d(3L) == ((0L, false)), "burst beyond capacity must be denied")
      assert(d(4L) == ((S / 2, false)), "half-refilled bucket cannot admit")
      assert(d(5L) == ((3 * S / 2, true)), "refill accrues across batches on the kept balance")
    } finally q.stop()
  }

  test("intervalJoin: [e, e+W) boundary semantics, matches found across micro-batches") {
    implicit val sc = spark.sqlContext
    import StreamingOps.RangeEvent
    val W    = 2000000L // 2 s window
    val base = 1000L * 60000L
    def t(offUs: Long): Timestamp = new Timestamp((base * 1000 + offUs) / 1000)
    val inC = MemoryStream[RangeEvent]
    val inE = MemoryStream[RangeEvent]
    val q = StreamingOps.intervalJoin(inC.toDS(), inE.toDS(), W)
      .writeStream.format("memory").queryName("sij_unit").outputMode("append").start()
    try {
      // errors arrive first (batch 1), clicks in a LATER batch — every
      // match must come from the join's buffered state
      inE.addData(RangeEvent(7L, t(0), 100L))
      q.processAllAvailable()
      inC.addData(
        RangeEvent(7L, t(0), 1L),           // c == e        -> in (left-closed)
        RangeEvent(7L, t(W - 1000000), 2L), // c == e+W-1s   -> in
        RangeEvent(7L, t(W), 3L),           // c == e+W      -> out (right-open)
        RangeEvent(8L, t(1000000), 4L))     // wrong user    -> out
      q.processAllAvailable()
      val got = spark.table("sij_unit")
        .select("click_id", "gap_us").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 0L), (2L, W - 1000000)))
    } finally q.stop()
  }

  test("intervalJoin left_outer: an unmatched click emits nulls only once the watermark proves it") {
    implicit val sc = spark.sqlContext
    import StreamingOps.RangeEvent
    val W    = 2000000L
    val base = 1000L * 60000L
    def t(offUs: Long): Timestamp = new Timestamp((base * 1000 + offUs) / 1000)
    val inC = MemoryStream[RangeEvent]
    val inE = MemoryStream[RangeEvent]
    val q = StreamingOps.intervalJoin(inC.toDS(), inE.toDS(), W, joinType = "left_outer")
      .writeStream.format("memory").queryName("sijl_unit").outputMode("append").start()
    try {
      inE.addData(RangeEvent(9L, t(0), 100L)) // different user: never a match
      inC.addData(RangeEvent(7L, t(0), 1L))   // the orphan click
      q.processAllAvailable()
      assert(spark.table("sijl_unit").count() == 0,
        "null row emitted before the watermark could prove no match arrives")
      // two sentinel rounds push the watermark past click + W and fire
      // the eviction pass that emits the unmatched-left row
      Seq(1L, 2L).foreach { d =>
        inC.addData(RangeEvent(-1L, t(d * 3600L * 1000000L), -1L))
        inE.addData(RangeEvent(-1L, t(d * 3600L * 1000000L), -2L))
        q.processAllAvailable()
      }
      val got = spark.table("sijl_unit").filter(col("user_id") =!= -1L)
        .select("click_id", "error_id").collect()
      assert(got.length == 1 && got.head.getLong(0) == 1L && got.head.isNullAt(1),
        got.mkString(","))
    } finally q.stop()
  }
}
