package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExtensions, TokenExpressions, GraftExpressions}
import graft.model.TokenCodec

/** SQL function surface (SparkSessionExtensions injector): every
  * registered name must resolve in spark.sql and produce exactly what
  * the Column API produces — same Expression node, so same codegen. */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def same(sqlText: String, c: org.apache.spark.sql.Column,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val a = df.select(expr(sqlText).cast("string")).collect().map(_.getString(0)).toSeq
    val b = df.select(c.cast("string")).collect().map(_.getString(0)).toSeq
    assert(a == b, s"$sqlText diverged from Column API")
    assert(a.exists(_ != null), s"$sqlText vacuous (all null)")
  }

  test("token_* SQL functions match the Column API on generated docs") {
    val docs = graft.gen.TokenGen.table(spark, 50).cache()
    same("token_blocks(tokens)",
      TokenExpressions.splitBlocks(col("tokens"), TokenCodec.RECORD_START), docs)
    same("token_fields(token_blocks(tokens)[0])",
      TokenExpressions.splitFields(
        element_at(TokenExpressions.splitBlocks(col("tokens"), TokenCodec.RECORD_START), 1),
        TokenCodec.FIELD_DELIM), docs)
    val fields = TokenExpressions.splitFields(
      element_at(TokenExpressions.splitBlocks(col("tokens"), TokenCodec.RECORD_START), 1),
      TokenCodec.FIELD_DELIM)
    same("token_payloads(token_fields(token_blocks(tokens)[0]), 3)",
      TokenExpressions.payloadsForTag(fields, 3), docs)
    same("token_decode(tokens)", TokenExpressions.decodeJoin(col("tokens")), docs)
    same("token_decode_all(token_payloads(token_fields(token_blocks(tokens)[0]), 3), 2)",
      TokenExpressions.decodeAll(TokenExpressions.payloadsForTag(fields, 3), 2), docs)
    same("token_find_all(tokens, array(100, 101))",
      TokenExpressions.tokenFindAll(col("tokens"), Seq(100, 101)), docs)
    same("token_find_all_flat(token_payloads(token_fields(token_blocks(tokens)[0]), 3), array(100, 101))",
      TokenExpressions.findAllFlat(TokenExpressions.payloadsForTag(fields, 3), Seq(100, 101)), docs)
    same("token_int_join(token_payloads(token_fields(token_blocks(tokens)[0]), 3))",
      TokenExpressions.intJoinAll(TokenExpressions.payloadsForTag(fields, 3)), docs)
    docs.unpersist()
  }

  test("graft_* SQL functions match the Column API") {
    val txt = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog"),
      ("d2", "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " "))
    same("graft_simhash64(w)", GraftExpressions.simhash64(col("w")), txt)
    same("graft_shingles(w, 3)", GraftExpressions.shingleSet(col("w"), 3), txt)
    same("graft_gram_hashes(w, 3)", GraftExpressions.gramHashes(col("w"), 3), txt)
    same("graft_winnow(graft_gram_hashes(w, 3), 4)",
      GraftExpressions.winnowSelect(GraftExpressions.gramHashes(col("w"), 3), 4), txt)

    val emb = Seq((1, Array(1.0f, 0.0f), 2, Array(0.6f, 0.8f)))
      .toDF("i", "a", "j", "b")
    same("graft_cosine(a, b)", GraftExpressions.cosineSim(col("a"), col("b")), emb)
  }

  test("a full extraction is expressible in ONE spark.sql statement") {
    graft.gen.TokenGen.table(spark, 30).createOrReplaceTempView("docs_sql")
    val got = spark.sql(
      """SELECT doc_id, b.block_idx,
        |  token_decode_all(token_payloads(token_fields(b.bt), 3), 2) AS names
        |FROM docs_sql
        |LATERAL VIEW posexplode(token_blocks(tokens)) b AS block_idx, bt
        |WHERE size(token_payloads(token_fields(b.bt), 3)) > 0
        |ORDER BY doc_id, block_idx""".stripMargin)
    val viaCompiler = graft.extract.ExtractCompiler.compile(
      graft.gen.TokenGen.table(spark, 30),
      graft.model.ExtractionSpec("sqlcheck", Seq(graft.model.FieldSpec(
        "Names", selector = 3, types = Seq(graft.model.ExtractorType.Text),
        filters = Seq(graft.model.TextFilter.Lower)))))
      .filter(col("Names_text").isNotNull)
      .orderBy(col("doc_id"), col("block_idx"))
    val a = got.select(col("doc_id"), col("block_idx"), col("names").cast("string"))
      .collect().map(_.toString).toSeq
    val b = viaCompiler.select(col("doc_id"), col("block_idx"),
      col("Names_text").cast("string")).collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("the injector class registers every function on a fresh SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new org.apache.spark.sql.graft.GraftExtensions().apply(ext) // must not throw
  }

  test("literal-int argument contract is enforced") {
    val docs = graft.gen.TokenGen.table(spark, 5)
    docs.createOrReplaceTempView("docs_badarg")
    val e = intercept[Exception] {
      spark.sql("SELECT token_payloads(token_fields(tokens), n_tok) FROM docs_badarg")
        .collect()
    }
    assert(e.getMessage.contains("literal"), s"unexpected: ${e.getMessage}")
  }
}
