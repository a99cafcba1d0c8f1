package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over the events table (extension beyond
  * reference parity — a training-data pipeline needs user/session rollups
  * for engagement filtering and per-session sampling).
  *
  * Batch path: the built-in `session_window` aggregation — an event extends
  * the current session iff its timestamp is at most previous-event-time +
  * gap (inclusive boundary), i.e. a new session starts only when the gap is
  * strictly greater than the threshold (pinned by the unit suite against
  * hand-computed boundaries). Scale shape: one shuffle keyed by (user, merged
  * window); no per-user collect, state bounded by session count.
  *
  * Streaming path: same `session_window` under a watermark, plus a
  * flatMapGroupsWithState variant ([[statefulSessions]]) showing the
  * custom-state API for semantics session_window can't express.
  */
object Sessionize {
  /** Per-session frame: (user_id, session_start, session_end, n_events). */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Per-user rollup: session count, event count, busiest session. */
  def userStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    sessions(events, gap)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"))

  // ------------------------------------------------------- custom state API

  final case class SessEvent(user_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, n_events: Long)

  /** SCD-2 validity intervals from an event/snapshot history: per key, each
    * observation is valid from its own timestamp until the NEXT
    * observation's (half-open [from, to)); the latest has valid_to null and
    * is flagged current. The standard "mutable entity → history table"
    * builder (page re-crawls, profile updates, price changes).
    *
    * Scale shape: one shuffle keyed by the entity key; `lead` is a per-key
    * sorted window — partitions are entity-sized, never corpus-sized. The
    * (version, tieBreak) order is total, so intervals are deterministic
    * under same-timestamp observations. */
  def scdIntervals(df: DataFrame, keys: Seq[Column], version: Column,
                   tieBreak: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(version, tieBreak)
    df.withColumn("valid_from", version)
      .withColumn("valid_to", lead(version, 1).over(w))
      .withColumn("is_current", when(col("valid_to").isNull, 1L).otherwise(0L))
  }

  /** flatMapGroupsWithState sessionizer: per user, merge the carried open
    * session with this batch's events (sorted in-group — group size is one
    * user's batch slice, not the whole partition) and emit every session
    * CLOSED by a later event; the trailing open session stays in state.
    * Used where session_window can't express the semantics (e.g. emitting
    * mid-session markers); equivalence with the batch path is pinned in
    * the unit suite.
    *
    * Cross-batch late data: an out-of-order event within the gap of the
    * open session EXTENDS it (start/last move by min/max — the extent
    * can never regress); an event older than that still merges into the
    * open session because closed sessions keep no state — a live
    * deployment bounds lateness to the gap with a watermark upstream. */
  def statefulSessions(events: Dataset[SessEvent], gapUs: Long)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          val ts = it.map(_.ts_us).toArray.sorted
          var open = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          ts.foreach { t =>
            open match {
              case Some(s) if t - s.last_us <= gapUs =>
                // min/max, not assignment: a late event must never move
                // the session extent backwards
                open = Some(s.copy(start_us = math.min(s.start_us, t),
                  last_us = math.max(s.last_us, t), n = s.n + 1))
              case Some(s) =>
                out += SessionOut(user, s.start_us, s.n)
                open = Some(OpenSession(t, t, 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          out.iterator
      }
  }
}
