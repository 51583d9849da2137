package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization with `flatMapGroupsWithState`: groups
  * events per key, extends an open session while gaps stay under
  * `gapMillis`, and emits each session once the event-time watermark passes
  * its close (event-time timeout — no wall-clock dependence).
  *
  * State per key is one (start, end, count) triple — constant size — and
  * the watermark bounds how long a key's state lives, so state volume is
  * O(active keys), independent of event volume. This is the streaming
  * counterpart of [[graft.operators.Sessionize]].
  *
  * NOTE: the watermark must be applied to a column that survives into the
  * grouped Dataset — a `.map` between `withWatermark` and
  * `flatMapGroupsWithState` serializes the event-time attribute away and
  * Spark rejects the query; hence the select + as[] plumbing here.
  */
object StreamingSessionize {

  case class OpenSession(start: Long, end: Long, n: Long)
  case class Session(key: Long, start: Long, end: Long, n_events: Long)

  /** @param df streaming DataFrame; `keyCol` castable to long, `tsCol` a
    *           timestamp column used for both watermark and session times
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMillis: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    implicit val pairEnc = Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP)
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong

    val evs = df
      .select(col(keyCol).cast("long").as("_k"), col(tsCol).cast("timestamp").as("_et"))
      .withWatermark("_et", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]

    evs.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the session can never be extended
            val s = state.get
            state.remove()
            Iterator(Session(key, s.start, s.end, s.n))
          } else {
            val sorted = rows.map(_._2.getTime).toSeq.sorted
            var closed = List.empty[Session]
            var open = state.getOption
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.end <= gapMillis =>
                  open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(key, s.start, s.end, s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }
}
