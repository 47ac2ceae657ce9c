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
    * when the event-time timeout fires (watermark passes last + gap). */
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
            // event-time order within the batch; iterator order is not
            // deterministic, the sort is what makes the result so
            val ts     = it.map(_.event_time.getTime).toArray.sorted
            var closed = List.empty[Session]
            var cur    = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed = Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n) :: closed
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
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
