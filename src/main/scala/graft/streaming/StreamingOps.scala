package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.G): the same transforms
  * as the batch twins (Analytics.qEventsWindow / qEventsSessionize),
  * expressed over an unbounded source with watermarks and state.
  *
  * The transforms take a generic DataFrame so identical logic runs in
  * batch (tests, backfills) and streaming (production) — the
  * batch/stream parity Structured Streaming is designed around.
  */
object StreamingOps {

  /** Schema of the events stream as landed by the upstream writer
    * (ts arrives as nanos-since-epoch long in the raw feed). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))

  // ---------------------------------------------------------------- G1
  /** Tumbling 1-hour windowed counts with a 2-hour watermark: the
    * streaming twin of Analytics.qEventsWindow. Append mode — windows
    * emit once finalized by the watermark. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  // ---------------------------------------------------------------- G2
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  case class SessionState(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  val gapMs: Long = 30 * 60 * 1000L

  /** Stateful gap-based sessionization via flatMapGroupsWithState:
    * events are folded into the open session per user; a >30-min gap
    * closes the session and emits it. The final open session per user
    * is emitted on event-time timeout (watermark passes the gap).
    * State is O(1) per user — the at-scale requirement. */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n))
          } else {
            val sorted = it.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed += Session(user, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
  }

  // ---------------------------------------------------------------- G3
  /** Streaming exact dedup on event_id within the watermark horizon:
    * the streaming arm of the dedup family — state holds only ids
    * within the watermark, bounding memory on an unbounded stream. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
}
