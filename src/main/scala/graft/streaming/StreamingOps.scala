package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the extraction pipeline's output
  * stream — the watermark / windowed-agg / custom-state triad a streaming
  * deployment needs (the batch twins are `q_events_window` and
  * `q_sessionize` in the oracle-checked catalog; these are their
  * readStream forms).
  *
  * Scale notes:
  *  - both operators key their state by a high-cardinality column
  *    (kind×window, user_id), so state is hash-distributed across
  *    executors like any shuffle — no global state;
  *  - watermarks bound state size: windows older than the watermark are
  *    finalized and dropped; sessions time out via
  *    `GroupStateTimeout.EventTimeTimeout`, so abandoned keys cannot
  *    accumulate forever (the classic unbounded-state leak);
  *  - `flatMapGroupsWithState` (not mapGroups…) because one micro-batch
  *    can close several sessions for the same key.
  */
object StreamingOps {

  /** One extracted span with its event time — the streaming shape of the
    * extraction output (doc_id × span kind). */
  final case class SpanEvent(event_time: Timestamp, doc_id: String, kind: String)

  /** Tumbling-window span throughput per kind. Append-mode output: a
    * window row is emitted once, when the watermark passes its end. */
  def windowedKindCounts(
      events: Dataset[SpanEvent],
      watermarkDelay: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowLen), col("kind"))
      .agg(count(lit(1)).as("n_spans"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("kind"), col("n_spans"))

  /** Streaming exact-dedup: the readStream form of `dedup_exact`. Keyed
    * by content hash (not doc_id — re-crawled bytes get new ids), state
    * bounded by the watermark via `dropDuplicatesWithinWatermark`: two
    * copies whose event times fall within the watermark delay dedupe
    * exactly; state for hashes older than the watermark is dropped, so
    * the dedup store cannot grow with stream length (the property that
    * makes streaming dedup at crawl scale possible at all — a full-history
    * exact store is the batch job's business, see `dedup_exact`). */
  def dedupStream(
      docs: DataFrame, // (event_time, doc_id, text)
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  final case class UserEvent(user_id: Long, event_time: Timestamp)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)
  /** Per-user open-session state (epoch millis — GroupState payloads
    * should stay small and encoder-friendly). */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Gap-based sessionization with custom state: a session closes when a
    * user is idle for `gap` or when a newer event arrives beyond the gap.
    * Closed-by-successor sessions emit immediately; idle sessions emit
    * when the event-time timeout fires (watermark passes last + gap).
    *
    * Cross-batch out-of-order handling (events are in-watermark but may
    * precede the open session's span): an event inside
    * [start - gap, last + gap] EXTENDS the session on both ends
    * (session_start is lowered, not just last raised); events more than a
    * gap BEFORE the open session's start form their own earlier
    * session(s) (late events within a gap of each other merge), emitted
    * immediately — they can never merge with the open session, and
    * anything that could merge with THEM would be beyond the watermark.
    * This keeps the stream consistent with the batch twin `q_sessionize`
    * for any in-watermark arrival order. */
  def sessionize(events: Dataset[UserEvent], gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            // Interval merge over (open session ∪ batch events) sorted by
            // start time: iterator order is not deterministic, the sort is
            // what makes the result so — and sorting the open session IN
            // with the events is what makes a late batch (events before
            // the session's start) produce the same sessions the batch
            // twin would.
            val intervals = (it.map { e =>
              val t = e.event_time.getTime; SessionState(t, t, 1)
            }.toSeq ++ state.getOption).sortBy(s => (s.start, s.last))
            var closed = List.empty[Session]
            var cur    = Option.empty[SessionState]
            intervals.foreach { iv =>
              cur match {
                case Some(s) if iv.start - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, iv.last), s.n + iv.n))
                case Some(s) =>
                  closed = Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n) :: closed
                  cur = Some(iv)
                case None =>
                  cur = Some(iv)
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
