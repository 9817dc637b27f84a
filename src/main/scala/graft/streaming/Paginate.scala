package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Pagination key generators — the recast of the reference's
 * `Paginator` interface (reference paginate/paginate.go:16-23) with
 * its two strategies:
 *
 *  - **BySelector** (paginate.go:39-46): the next-page key is
 *    extracted FROM the current page — in this engine that is simply
 *    data flowing through the stream (the stitcher consumes
 *    `(doc_id, page_idx)` fragments; the details compiler follows
 *    extracted Path keys), so no operator is needed.
 *  - **ByQueryParam** (paginate.go:60-91): the next-page key is
 *    DERIVED from the current one by incrementing an integer query
 *    parameter (`?p=N` → `?p=N+1`). The reference generates keys one
 *    at a time inside the crawl recursion; declaratively the whole
 *    key sequence per start key is known at plan time, so it compiles
 *    to a single generator expression — `posexplode(sequence(...))` —
 *    and the "recursion" becomes one narrow explode that fans the
 *    frontier out to (maxPages × starts) rows in a single stage.
 *
 * Scale: the explode is narrow (no shuffle); downstream resolution
 * joins the generated keys against the document table exactly like
 * details keys, so frontier expansion parallelizes with partition
 * count instead of crawl-loop depth.
 */
object Paginate {

  /** Page-key column for one (start, page) pair: `start?param=idx`. */
  private def pageKey(start: Column, param: String, idx: Column): Column =
    concat(start, lit(s"?$param="), idx.cast("string"))

  /**
   * Expand each start key into its page-key sequence:
   * input columns + `(page_idx, page_key)`, page_idx ∈ [0, maxPages).
   * `maxPages` must be positive — the reference's `0 = unlimited`
   * contract is the session-window/stitcher path (unbounded frontier
   * is a streaming concern, not a batch expansion).
   */
  def byQueryParam(
      starts: DataFrame,
      keyCol: String,
      param: String = "p",
      maxPages: Int = 1): DataFrame = {
    require(maxPages > 0, "byQueryParam needs a positive page bound")
    starts.select(col("*"),
      posexplode(transform(sequence(lit(0), lit(maxPages - 1)),
        i => pageKey(col(keyCol), param, i))).as(Seq("page_idx", "page_key")))
  }
}
