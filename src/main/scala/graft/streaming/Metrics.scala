package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One row of the per-batch metrics table. */
final case class BatchMetric(
    query_name: String,
    batch_id: Long,
    input_rows: Long,
    batch_duration_ms: Long,
    state_rows_total: Long,
    state_rows_updated: Long,
    rows_dropped_by_watermark: Long,
    sink_description: String)

/**
 * Streaming metrics surface (north_rule: "resumable from checkpoint
 * with per-partition lineage AND METRICS"): a StreamingQueryListener
 * that captures every micro-batch's progress — input volume, batch
 * wall, state-store totals, late-row drops — into a queryable
 * DataFrame. Lineage lives on the data rows themselves
 * (`_batch_id`/`_part_id`, ResultTable.appendBatch); this is the
 * operational side: the reference's only analog is the per-task error
 * list + block counter (structure.go:182-186).
 *
 * Driver-side only and O(batches): progress objects are tiny; at
 * cluster scale the same listener feeds the metrics sink instead of a
 * queue (swap `snapshot` for a foreachBatch append — the capture path
 * is identical).
 */
final class MetricsListener extends StreamingQueryListener {
  private val buf = new ConcurrentLinkedQueue[BatchMetric]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    buf.add(BatchMetric(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(-1L),
      p.stateOperators.map(_.numRowsTotal).sum,
      p.stateOperators.map(_.numRowsUpdated).sum,
      p.stateOperators.map(_.numRowsDroppedByWatermark).sum,
      Option(p.sink).map(_.description.take(80)).getOrElse("")))
  }

  /** The metrics table as of now. */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buf.asScala.toSeq.toDF()
  }

  def rows: Seq[BatchMetric] = buf.asScala.toSeq
}

object Metrics {
  /** Install a listener on the session; caller keeps the handle. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }
}
