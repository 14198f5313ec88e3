package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Merge

/** Custom-state streaming operators (SURVEY.md §2.10 extension tier):
  * sessionization via `flatMapGroupsWithState` and a streaming
  * re-implementation of the J4 upsert via `foreachBatch`.
  *
  * The session fold is one pure function shared by the batch
  * (`flatMapGroups`) and streaming (`flatMapGroupsWithState`) paths,
  * so the batch result is the ground truth for the stream.
  */
object StatefulOps {

  case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** µs-precision conversions — `Timestamp.getTime` truncates to ms,
    * which diverges from `session_window`'s µs arithmetic. */
  def toMicros(ts: Timestamp): Long = {
    val inst = ts.toInstant
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }
  def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Fold sorted event times into gap-separated sessions, optionally
    * continuing from a carried open session. Returns (closed sessions,
    * open trailing session or null). */
  def foldSessions(times: Seq[Long], gapMs: Long,
      carried: Option[SessionState]): (Seq[SessionState], SessionState) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    var cur: SessionState = carried.orNull
    times.foreach { t =>
      if (cur == null) cur = SessionState(t, t, 1)
      else if (t - cur.last >= gapMs) {
        out += cur; cur = SessionState(t, t, 1)
      } else cur = SessionState(cur.start, t, cur.n + 1)
    }
    (out.toSeq, cur)
  }

  private def toOut(uid: Long, s: SessionState, gapUs: Long) =
    SessionOut(uid, fromMicros(s.start), fromMicros(s.last + gapUs), s.n)

  /** Batch sessionization — per-user fold inside each group; one
    * shuffle on user_id. Matches `session_window` semantics
    * ([start, last+gap)). */
  def sessionizeBatch(events: Dataset[EventRow], gapUs: Long)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val (closed, open) = foldSessions(
        it.map(e => toMicros(e.ts)).toSeq.sorted, gapUs, None)
      (closed ++ Option(open)).map(toOut(uid, _, gapUs)).iterator
    }
  }

  /** Streaming sessionization with explicit GroupState: sessions are
    * emitted once a later event proves the gap passed; the open
    * session flushes on processing-time timeout. State per key is one
    * (start, last, n) triple — bounded regardless of stream length. */
  def sessionizeStream(events: Dataset[EventRow], gapUs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeout)(
        (uid: Long, it: Iterator[EventRow],
            state: GroupState[SessionState]) => {
          if (useTimeout && state.hasTimedOut) {
            val last = state.getOption.map(toOut(uid, _, gapUs))
            state.remove()
            last.iterator
          } else {
            val (closed, open) = foldSessions(
              it.map(e => toMicros(e.ts)).toSeq.sorted, gapUs,
              state.getOption)
            if (open != null) {
              state.update(open)
              if (useTimeout) state.setTimeoutDuration(gapUs / 1000L)
            }
            closed.map(toOut(uid, _, gapUs)).iterator
          }
        })
  }

  // ---- stateful funnel ---------------------------------------------

  /** Per-user funnel progression state (µs timestamps; MaxValue =
    * stage not reached). Bounded: three longs per user regardless of
    * stream length. */
  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)
  case class FunnelOut(user_id: Long, t_view: Timestamp,
      t_click: Timestamp, t_purchase: Timestamp)

  val FunnelUnset: Long = Long.MaxValue
  val EmptyFunnel: FunnelState =
    FunnelState(FunnelUnset, FunnelUnset, FunnelUnset)

  /** Fold ts-ordered (event_type, micros) pairs into the funnel:
    * first view, first click strictly after that view, first purchase
    * strictly after that click — the stateful form of [[graft.queries
    * .AnalyticsExt.qFunnel]]'s semantics. Exact when events are
    * folded in timestamp order (the watermark contract): by the time
    * a click at t is folded every view before t has been folded, so
    * the stage decision at t is final; an event later than the
    * watermark bound may be mis-ordered and is the documented
    * approximation, exactly as in production streaming funnels. */
  def foldFunnel(events: Seq[(String, Long)], st: FunnelState)
      : FunnelState = {
    var s = st
    events.foreach { case (typ, t) =>
      typ match {
        case "view" =>
          if (t < s.tView) s = s.copy(tView = t)
        case "click" =>
          if (s.tView != FunnelUnset && t > s.tView && t < s.tClick)
            s = s.copy(tClick = t)
        case "purchase" =>
          if (s.tClick != FunnelUnset && t > s.tClick &&
              t < s.tPurchase)
            s = s.copy(tPurchase = t)
        case _ => ()
      }
    }
    s
  }

  private def funnelOut(uid: Long, s: FunnelState): Iterator[FunnelOut] =
    if (s.tView == FunnelUnset) Iterator.empty
    else Iterator.single(FunnelOut(uid, fromMicros(s.tView),
      if (s.tClick == FunnelUnset) null else fromMicros(s.tClick),
      if (s.tPurchase == FunnelUnset) null
      else fromMicros(s.tPurchase)))

  /** Batch funnel — one shuffle on user_id, per-user in-memory sort +
    * fold. The ground truth for [[funnelStream]]. */
  def funnelBatch(events: Dataset[EventRow]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      funnelOut(uid, foldFunnel(
        it.map(e => (e.event_type, toMicros(e.ts))).toSeq.sortBy(_._2),
        EmptyFunnel))
    }
  }

  /** Streaming funnel with explicit GroupState: each micro-batch
    * folds its (sorted) events into the per-user state and emits the
    * user's current funnel row (Update mode — downstream upserts by
    * user_id).
    *
    * State is BOUNDED (the property [[sessionizeStream]] always had
    * and r6 proved for streaming dedup): every user — completed or
    * partial — evicts on idle timeout (`idleUs`, default 24h
    * event-time past the user's last event). The default event-time
    * form applies `delayThreshold` as the input watermark and expires
    * a user once the watermark passes last-event + idle, so live
    * state is ≤ users ACTIVE within the idle horizon — independent of
    * lifetime distinct users.
    *
    * Completed funnels deliberately HOLD state until the TTL rather
    * than evicting on completion: a completed state is a fixpoint of
    * [[foldFunnel]] under in-order arrival, so keeping it makes
    * post-purchase activity re-emit the SAME completed row — evicting
    * eagerly would instead fold the user's next event from empty and
    * the downstream Update-mode upsert would regress the conversion
    * to a partial row. The residual (documented) trade of any TTL'd
    * state: a user who reappears after full idle expiry folds from
    * empty and emits a fresh partial row — same contract as every
    * production streaming funnel. Pass `GroupStateTimeout.NoTimeout`
    * for the exact-convergence test shape (no watermark, no
    * eviction). */
  def funnelStream(events: Dataset[EventRow],
      timeout: GroupStateTimeout = GroupStateTimeout.EventTimeTimeout,
      delayThreshold: String = "1 hour",
      idleUs: Long = 24L * 3600L * 1000000L): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val eventTime = timeout == GroupStateTimeout.EventTimeTimeout
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    val src =
      if (eventTime) events.withWatermark("ts", delayThreshold)
      else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update, timeout)(
        (uid: Long, it: Iterator[EventRow],
            state: GroupState[FunnelState]) => {
          if (useTimeout && state.hasTimedOut) {
            // every update was already emitted (Update mode): expiry
            // only drops the state row
            state.remove()
            Iterator.empty
          } else {
            val evs = it.map(e => (e.event_type, toMicros(e.ts)))
              .toSeq.sortBy(_._2)
            val s = foldFunnel(evs, state.getOption.getOrElse(EmptyFunnel))
            state.update(s)
            if (eventTime) {
              // expire once the watermark passes last-event + idle;
              // clamp above the current watermark (setTimeoutTimestamp
              // rejects timestamps the watermark already passed)
              val lastMs = evs.map(_._2).max / 1000L
              state.setTimeoutTimestamp(math.max(
                lastMs + idleUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            } else if (useTimeout) {
              state.setTimeoutDuration(idleUs / 1000L)
            }
            funnelOut(uid, s)
          }
        })
  }

  /** Latest row per key (µs ts + event_id as the total tiebreak);
    * bounded: one row's columns per live user. */
  case class LatestState(ts: Long, eventId: Long, eventType: String,
      value: Double)
  case class LatestOut(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String, value: Double)

  /** Pick the later of two candidate states by (ts, event_id) — the
    * ONE ordering rule shared by the streaming fold, the batch
    * struct-max, and the oracle's `row_number` replay; event_id is
    * unique so the order is total and the winner engine-independent. */
  def laterOf(a: LatestState, b: LatestState): LatestState =
    if (b.ts > a.ts || (b.ts == a.ts && b.eventId > a.eventId)) b else a

  /** Streaming changelog materialization — the state-store form of a
    * keyed UPSERT: each micro-batch folds its events into a per-user
    * "latest row" and emits the user's current row (Update mode;
    * downstream sinks upsert by user_id). This is how a streaming
    * pipeline maintains a continuously-fresh dimension/profile table
    * without re-reading history: state is ONE row per live user, and
    * with `EventTimeTimeout` (production form) users idle past
    * `idleUs` evict, so live state tracks the active-user set, not
    * lifetime distinct users.
    *
    * Exactness: [[laterOf]] is associative/commutative-idempotent on
    * the unique (ts, event_id) order, so the fold result is
    * independent of batch boundaries — the final emitted row per user
    * provably equals the batch argmax ([[stUpsertState]]'s form),
    * which the spec asserts across a multi-batch replay. */
  def latestStream(events: Dataset[EventRow],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      delayThreshold: String = "1 hour",
      idleUs: Long = 24L * 3600L * 1000000L): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    val eventTime = timeout == GroupStateTimeout.EventTimeTimeout
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    val src =
      if (eventTime) events.withWatermark("ts", delayThreshold)
      else events
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestState, LatestOut](
        OutputMode.Update, timeout)(
        (uid: Long, it: Iterator[EventRow],
            state: GroupState[LatestState]) => {
          if (useTimeout && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batchBest = it.map(e => LatestState(toMicros(e.ts),
              e.event_id, e.event_type, e.value)).reduce(laterOf)
            val s = state.getOption
              .map(laterOf(_, batchBest)).getOrElse(batchBest)
            state.update(s)
            if (eventTime)
              state.setTimeoutTimestamp(math.max(
                s.ts / 1000L + idleUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            else if (useTimeout)
              state.setTimeoutDuration(idleUs / 1000L)
            Iterator.single(LatestOut(uid, fromMicros(s.ts), s.eventId,
              s.eventType, s.value))
          }
        })
  }

  /** Streaming J4 upsert: each micro-batch of user rows merges into
    * the target parquet state via `foreachBatch` + [[Merge.merge]] —
    * the streaming re-expression of the reference's per-row upsert
    * loop. Overwrite-swap via a temp dir keeps the target readable
    * mid-rewrite. */
  def streamingUpsert(staged: DataFrame, targetDir: String,
      keys: Seq[String], compareCols: Seq[String]) = {
    staged.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val cur =
          try spark.read.parquet(targetDir)
          catch { case _: Throwable => batch.limit(0) }
        val merged = Merge.merge(batch.dropDuplicates(keys), cur,
          keys, compareCols)
          .drop(Merge.ActionCol)
        val tmp = targetDir + "_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite")
          .parquet(targetDir)
        ()
    }
  }
}
