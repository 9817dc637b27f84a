package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.model.TokenCodec

/**
 * UDAF surface (SURVEY §2.10): a typed `Aggregator[IN, BUF, OUT]`
 * registered through `udaf(...)` — the per-source statistic beyond
 * builtins that the reference computes by iterating blocks under the
 * task mutex (reference scrape/scrape.go:534-584 accumulates per-part
 * results; our analog folds per-row token arrays into a fixed-width
 * histogram with map-side partial merge for free).
 *
 * Semantics: counts occurrences of each selector-tag token in
 * [MIN_TAG, MIN_TAG + Bins) across all `tokens` arrays of a group —
 * the "which selectors does this source use" profile.
 *
 * Scale: the buffer is a fixed Array[Long](Bins) — constant-size
 * state, associative merge, so Spark runs it as partial_taghist →
 * merge exactly like a builtin sum; no per-group row materialization.
 */
object TagHistogram {

  /** Histogram width: tags MIN_TAG until MIN_TAG+Bins. */
  val Bins = 10

  private final class Agg extends Aggregator[Array[Int], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](Bins)
    def reduce(buf: Array[Long], tokens: Array[Int]): Array[Long] = {
      if (tokens != null) {
        var i = 0
        while (i < tokens.length) {
          val t = tokens(i) - TokenCodec.MIN_TAG
          if (t >= 0 && t < Bins) buf(t) += 1L
          i += 1
        }
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < Bins) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The aggregate as a Column function: `tagHistogram(col("tokens"))`. */
  def tagHistogram(tokens: Column): Column = udaf(new Agg).apply(tokens)

  /** SQL registration, for `spark.sql("SELECT tag_histogram(tokens) ...")`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("tag_histogram", udaf(new Agg))
}
