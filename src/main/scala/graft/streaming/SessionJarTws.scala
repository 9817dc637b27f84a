package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Jar state for the transformWithState binding: the fMGWS
  * [[JarState]] plus the currently-registered eviction timer (the
  * new API exposes timers as explicit register/delete handles rather
  * than one implicit timeout per key, so the operator must remember
  * which timer it owns to reschedule it). */
final case class TwsJarState(
    cookies: Array[String], lastEventMs: Long, timerMs: Long)

/**
 * The [[SessionJar]] operator on the Spark 4.x arbitrary-state API
 * (`transformWithState` + `StatefulProcessor`, SURVEY §2.10) —
 * byte-identical output to `SessionJar.hydrate` (pinned by
 * StreamingSpec), with the same event-time TTL semantics expressed
 * through explicit timers:
 *
 *  - `ValueState[TwsJarState]` replaces `GroupState[JarState]`;
 *  - `registerTimer(lastEvent + ttl)` (rescheduled per batch via
 *    `deleteTimer`) replaces `setTimeoutTimestamp`; expiry clears the
 *    state in `handleExpiredTimer` — the diskv `Expired()` analog
 *    (reference storage/diskv.go:49-81, TTL `ITEM_EXPIRE_IN`);
 *  - the in-batch fold is the shared `SessionJar.foldEvents`.
 *
 * Scale notes: transformWithState requires the RocksDB state-store
 * provider (state ≫ heap — the KV-store recast of SURVEY §2.1 S6);
 * state stays O(cookies) per live session and the only shuffle keys
 * by user_token. Prefer this binding where Spark ≥ 4.0 is assured:
 * per-state TTLConfig, multiple typed state variables per key, and
 * state-schema evolution come with it. The fMGWS binding stays for
 * provider-agnostic deployments (HDFSBacked included) and as the
 * semantics cross-check.
 */
object SessionJarTws {

  private final class JarProcessor(ttlMs: Long)
      extends StatefulProcessor[String, CookieEvent, HydratedEvent] {
    @transient private var jar: ValueState[TwsJarState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // TTLConfig.NONE: TTLConfig evicts on PROCESSING time; the
      // reference's storage TTL is event-time-shaped in our recast
      // (deterministic tests, replayability), so eviction runs on
      // event-time timers instead
      jar = getHandle.getValueState[TwsJarState](
        "jar", Encoders.product[TwsJarState], TTLConfig.NONE)

    override def handleInputRows(
        token: String,
        rows: Iterator[CookieEvent],
        timerValues: TimerValues): Iterator[HydratedEvent] = {
      val prev =
        if (jar.exists()) jar.get()
        else TwsJarState(Array.empty, Long.MinValue, Long.MinValue)
      val (out, s) = SessionJar.foldEvents(
        token, rows, JarState(prev.cookies, prev.lastEventMs), ttlMs)
      if (prev.timerMs != Long.MinValue) getHandle.deleteTimer(prev.timerMs)
      // same guard as the fMGWS binding: never schedule at or before
      // the current watermark (the runtime rejects stale timers)
      val fire = math.max(s.lastEventMs + ttlMs,
        timerValues.getCurrentWatermarkInMs() + 1)
      getHandle.registerTimer(fire)
      jar.update(TwsJarState(s.cookies, s.lastEventMs, fire))
      out.iterator
    }

    override def handleExpiredTimer(
        token: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[HydratedEvent] = {
      jar.clear()
      Iterator.empty
    }
  }

  /** The operator: identical contract to [[SessionJar.hydrate]]. */
  def hydrate(
      events: Dataset[CookieEvent],
      ttlMs: Long = 86400000L,
      watermarkDelay: String = "10 minutes"): Dataset[HydratedEvent] = {
    implicit val outEnc = Encoders.product[HydratedEvent]
    events
      .withWatermark("event_time", watermarkDelay)
      .groupByKey(_.user_token)(Encoders.STRING)
      .transformWithState(
        new JarProcessor(ttlMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
