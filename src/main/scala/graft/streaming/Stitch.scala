package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.gen.Fragment

/** A fully assembled document emitted by the stitcher — matches the
  * canonical stored-table schema (BASELINE input_hint) plus streaming
  * metadata. */
final case class AssembledDoc(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String,
    event_time: Timestamp,
    n_frags: Int)

/** Stitcher state: page_idx → fragment tokens, plus bookkeeping.
  * Must be case-class-encodable (stored in the state store — RocksDB
  * provider in production, HDFS-backed in tests). */
final case class StitchState(
    pages: Map[Int, Array[Int]],
    source: String,
    maxEventMs: Long)

/**
 * Fragment assembly — the session-window analog of the reference's
 * paginated multi-request assembly (reference scrape/scrape.go:394-427
 * recursive pagination + the sorted key map scrape.go:138-156 that
 * restores (page, block) order at read-back).
 *
 * A document's fragments `(doc_id, page_idx, tokens)` may arrive
 * out of order and duplicated across micro-batches. We key state by
 * `doc_id` and buffer `page_idx → tokens`; when no new fragment has
 * arrived within `gap` of event time (watermark-driven timeout — the
 * session-window close), we emit the document with fragments
 * concatenated in `page_idx` order, byte-equal to the at-rest table
 * (token-array equality invariant).
 *
 * Exact duplicate fragments collapse naturally (same page_idx, same
 * bytes — the reference's CRC32-keyed idempotent writes,
 * scrape.go:448-457). Late fragments beyond the watermark are dropped
 * *before* this operator by the upstream `dropDuplicates` watermark
 * (counted in StreamingQueryProgress.stateOperators
 * numRowsDroppedByWatermark — the reference records them on the task
 * error list, structure.go:182).
 *
 * Scale: state is per-in-flight-document, O(pages) each; the shuffle
 * into this operator partitions by doc_id (hash — uniformly spread, so
 * no salting needed here; source-keyed skew is handled at the pacing/
 * agg stages). At 10^12 docs the in-flight window, not the table size,
 * bounds state: watermark + timeout evict every closed session.
 */
object Stitch {

  /** Per-group update: merge new fragments, or emit+evict on timeout. */
  def update(gapMs: Long)(
      docId: String,
      rows: Iterator[Fragment],
      state: GroupState[StitchState]): Iterator[AssembledDoc] = {
    if (state.hasTimedOut) {
      val s = state.get
      val pages = s.pages.toSeq.sortBy(_._1)
      val tokens = pages.flatMap(_._2).toArray
      state.remove()
      Iterator.single(AssembledDoc(
        docId, tokens, tokens.length, s.source,
        new Timestamp(s.maxEventMs), pages.size))
    } else {
      var s = state.getOption.getOrElse(StitchState(Map.empty, "", Long.MinValue))
      rows.foreach { f =>
        s = StitchState(
          s.pages + (f.page_idx -> f.tokens), // dup page overwrite = dedup
          f.source,
          math.max(s.maxEventMs, f.event_time.getTime))
      }
      state.update(s)
      // session close = gap past the newest fragment; must stay ahead
      // of the current watermark or Spark rejects the timestamp
      val wm = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(math.max(s.maxEventMs + gapMs, wm + 1))
      Iterator.empty
    }
  }

  /**
   * dedup → stitch. `watermarkDelay` bounds late-fragment acceptance
   * (reference: no bound — unbounded memory; ours is the north_rule
   * fix); `gap` is the session gap closing a document.
   *
   * The `dropDuplicates` stage is the crawl-frontier dedup of
   * north_star: watermark-scoped state keyed by (doc_id, page_idx),
   * drops exact re-emissions AND late rows (counted by the state
   * operator's numRowsDroppedByWatermark metric).
   */
  def stitch(
      fragments: Dataset[Fragment],
      watermarkDelay: String = "10 minutes",
      gapMs: Long = 30000L): Dataset[AssembledDoc] = {
    implicit val fragEnc = Encoders.product[Fragment]
    implicit val docEnc = Encoders.product[AssembledDoc]
    implicit val stateEnc = Encoders.product[StitchState]
    fragments
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id", "page_idx")
      .groupByKey(_.doc_id)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(gapMs))
  }
}
