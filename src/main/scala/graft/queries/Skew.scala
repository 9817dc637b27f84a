package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew-handling operators (north_rule: "partitioning /
 * shuffle / skew handled explicitly"). Two mechanisms already cover
 * most of this engine's plans for free — map-side partial aggregation
 * bounds reducer input for decomposable aggs, and AQE's skew-join
 * split rebalances batch sort-merge joins at runtime. The two cases
 * those do NOT cover are exactly what this module provides:
 *
 *  1. [[saltedJoin]] — an equi-join whose probe side hammers a few hot
 *     keys (many listing blocks referencing one popular detail page,
 *     reference scrape/scrape.go:586-654), in a context where AQE
 *     cannot help: streaming joins (AQE is disabled in stateful
 *     queries) or any plan where the skew must be fixed statically.
 *  2. [[saltedAgg]] — a grouped aggregation whose per-key state does
 *     NOT compress map-side (collect_list/collect_set and friends):
 *     partial agg still ships every element, so a Zipf-hot group key
 *     lands one reducer with the whole hot group. Decomposable aggs
 *     (sum/count/min/max) never need this — partial agg already
 *     bounds them; use the plain groupBy there.
 *
 * Both spread each hot key over `nSalts` reducers and pay one extra
 * narrow stage — the standard trade at 100 TB where a single hot key
 * is otherwise the whole job's critical path.
 */
object Skew {

  /** Deterministic salt in [0, nSalts): hash of a row-unique column
    * (NOT rand() — retries/speculative tasks must re-salt a row
    * identically or a replayed task double-joins it). */
  def saltOf(rowUnique: Column, nSalts: Int): Column =
    pmod(hash(rowUnique), lit(nSalts))

  /**
   * Salted equi-join on `key`: the (large, skewed) probe side gets a
   * deterministic salt from a row-unique column; the build side
   * replicates nSalts× so every (key, salt) pair finds its match. The
   * shuffle partitions by (key, __salt), so a key carrying p% of the
   * probe rows spreads over nSalts reducers instead of one.
   *
   * Build-side cost is nSalts× its row count — use for a build side
   * far smaller than the probe side but too big (or streaming, where
   * broadcast of an evolving side is unavailable) to broadcast.
   */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeRowUnique: Column,
      nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val p = probe.withColumn("__salt", saltOf(probeRowUnique, nSalts))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    p.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /**
   * Two-stage salted aggregation for non-compressing aggs over hot
   * keys: stage 1 groups by (keys, salt) and runs `partial`; stage 2
   * groups by keys alone and runs `merge` over the partial columns.
   * The caller supplies the decomposition (e.g. collect_list →
   * flatten(collect_list(partial_list))); both stages keep map-side
   * combine for whatever IS decomposable.
   */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Column,
      nSalts: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && partial.nonEmpty && merge.nonEmpty, "empty salted-agg spec")
    df.withColumn("__salt", saltOf(saltFrom, nSalts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
