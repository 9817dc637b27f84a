package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.extract.ExtractCompiler
import graft.gen.TokenGen
import graft.queries.{Relational, TokenEngine}

/** Physical-plan audits: the properties that make these plans survive
  * a 100 TB / 1000-executor deployment, pinned as tests so a refactor
  * that silently de-optimizes a plan fails CI — filter/column
  * pushdown into the parquet scan, broadcast joins for dimension
  * tables, narrow (shuffle-free) extraction, whole-stage codegen over
  * the hot path. */
class PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("extraction pipeline is narrow: no shuffle from scan to part columns") {
    val plan = physical(ExtractCompiler.compile(
      TokenGen.table(spark, 100), TokenEngine.flagshipSpec))
    // TokenGen.table itself stitches with one groupBy; everything the
    // compiler ADDS must be exchange-free, so compile over a plain
    // parquet-like frame instead:
    import spark.implicits._
    val docs = Seq(("d", Array(2, 3, 100, 1), 4, "s")).toDF("doc_id", "tokens", "n_tok", "source")
    val p2 = physical(ExtractCompiler.compile(docs, TokenEngine.flagshipSpec))
    assert(!p2.contains("Exchange"), s"extraction must not shuffle:\n$p2")
  }

  test("extract_grouped shuffles exactly twice: one hash agg, one presentation sort") {
    // the grouped digest must build on the UNSORTED extraction —
    // inheriting extractFlat's orderBy would add a third (range)
    // exchange + sort below the aggregate that Catalyst does not
    // eliminate (verified via explain when this was pinned)
    val p = physical(TokenEngine.extractGrouped(spark, sf))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges (agg + final sort), got $exchanges:\n$p")
  }

  test("streaming-fold batch images shuffle once on their state key (+ presentation sort)") {
    // pacing_schedule / session_stitch / session_jar group on the SAME
    // key their streaming operators key state by (source / doc_id /
    // user_token): exactly one hash exchange into the fold plus the
    // final range exchange for the ordered driver output — a plan that
    // grew a third exchange is re-shuffling the fold's input
    for ((name, df) <- Seq(
        "pacing_schedule" -> TokenEngine.pacingSchedule(spark, sf),
        "session_stitch" -> TokenEngine.sessionStitch(spark, sf),
        "session_jar" -> TokenEngine.sessionJarFold(spark, sf))) {
      val p = physical(df)
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges == 2, s"$name: expected 2 exchanges (fold key + sort), got $exchanges:\n$p")
    }
  }

  test("salted aggregation is two-phase: exactly two hash exchanges plus the presentation sort") {
    val p = physical(TokenEngine.skewSalted(spark, sf))
    val exchanges = "Exchange".r.findAllIn(p).length
    // (source, salt) partial → source merge → orderBy
    assert(exchanges == 3, s"expected 3 exchanges (salted partial + merge + sort), got $exchanges:\n$p")
  }

  test("custom kernels run inside the whole-stage-codegen span") {
    import spark.implicits._
    val docs = Seq(("d", Array(2, 3, 100, 1), 4, "s")).toDF("doc_id", "tokens", "n_tok", "source")
    val p = physical(ExtractCompiler.compile(docs, TokenEngine.flagshipSpec))
    // `*(n)` marks operators inside a codegen stage: the segmentation
    // generator (splitblocks) and field split (splitfields) must carry
    // it. The outer per-tag projections use higher-order functions,
    // which Spark never codegens — but those operate on the small
    // per-block field arrays the kernels produced, not raw tokens.
    assert("\\*\\(\\d+\\) Generate posexplode\\(splitblocks".r.findFirstIn(p).nonEmpty,
      s"splitblocks not in codegen span:\n$p")
    assert("\\*\\(\\d+\\) Project .*splitfields".r.findFirstIn(p).nonEmpty,
      s"splitfields not in codegen span:\n$p")
    assert(!p.toLowerCase.contains("codegenfallback"), "kernel expressions must codegen")
  }

  test("filter and projection push into the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_suppkey") <= 10)
      .select("l_suppkey", "l_orderkey")
    val p = physical(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_suppkey), LessThanOrEqual(l_suppkey,10)]"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint>"),
      s"columns not pruned:\n$p")
  }

  test("dimension joins broadcast; no sort-merge for nation/part lookups") {
    val p1 = physical(Relational.qBroadcastJoin(spark, sf))
    assert(p1.contains("BroadcastHashJoin"), s"part join must broadcast:\n$p1")
    val p2 = physical(Relational.qJoinAgg(spark, sf))
    assert(p2.contains("BroadcastHashJoin"), s"nation join must broadcast:\n$p2")
  }

  test("semi/anti joins compile to join strategies, not subquery re-scans") {
    val p1 = physical(Relational.qSemiJoin(spark, sf))
    assert(p1.contains("LeftSemi"), s"expected left-semi join:\n$p1")
    val p2 = physical(Relational.qAntiJoin(spark, sf))
    assert(p2.contains("LeftAnti"), s"expected left-anti join:\n$p2")
  }

  test("aggregations use partial (map-side) combine") {
    val p = physical(Relational.q1Agg(spark, sf))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no partial aggregation:\n$p")
  }

  test("window aggregates shuffle once on (window, source) grouping") {
    val p = physical(Relational.qTumbling(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"tumbling agg should shuffle at most twice (agg + sort):\n$p")
  }

  test("no driver-facing query emits nested columns (the driver compare crashes on them)") {
    // Round 1 lost 3 correctness rows to array<...> output columns —
    // the driver's pandas sort dies on unhashable ndarray cells. Guard
    // every SparkEntry entry at the schema level (plan-only, no
    // execution) so a refactor cannot re-introduce the failure class.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    for ((name, fn) <- SparkEntry.queries) {
      val schema = fn(spark, sf).schema
      val nested = schema.fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType])
      assert(nested.isEmpty,
        s"query '$name' emits nested columns ${nested.map(_.name).toSeq} — scalarize them")
    }
  }
}
