package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.gen.TokenGen

/**
 * Similarity search over an embedding column (`embeddings` table:
 * vec_id, embedding: array<float>, label).
 *
 *  - [[bruteTopK]] — exact top-k cosine neighbors: broadcast the
 *    (small) query set against the full corpus, rank per query. The
 *    corpus is scanned once, never shuffled; per-row work is the
 *    codegen'd cosine kernel. This is the correctness baseline and
 *    also the right plan at any corpus size when |queries| is small.
 *  - [[lshCandidates]] / [[lshTopK]] — the scale path: random-
 *    hyperplane signatures (deterministic, seeded) bucket the corpus;
 *    a query only meets candidates sharing a bucket in ≥1 table.
 *    Corpus-side signatures are narrow per-row work; the only
 *    shuffle is the (vec_id, table, bucket) equi-join. Recall is
 *    tunable by (nTables, nPlanes); exactness within met candidates.
 */
object Similarity {

  /** Deterministic unit-free hyperplanes: values in [-1,1) from the
    * seeded xorshift stream; plane p of table t is independent. */
  private[pipeline] def hyperplanes(
      nTables: Int, nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rng = new TokenGen.Rng(seed)
    Seq.fill(nTables)(Seq.fill(nPlanes)(Array.fill(dim)(rng.nextDouble() * 2 - 1)))
  }

  /** Exact top-k neighbors for each query vector. Query side must be
    * small (it is broadcast); `excludeSelf` drops the query row
    * itself from its neighbor list. */
  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("nv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("q_id") =!= col("n_id") else lit(true))
      .withColumn("cos", VectorExprs.cosineSim(col("qv"), col("nv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"), col("n_id"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** (vec_id, table, bucket) rows: bucket = sign bits of the vector
    * against each hyperplane of the table, via the fused
    * HyperplaneBucket codegen expression — ONE pass over the vector
    * per table (sign(dot) == sign(cosine), so norms never compute).
    * Round-1 evaluated nPlanes separate cosine kernels per table,
    * each redoing both norms — the dominant ann_lsh cost. */
  def lshCandidates(
      emb: DataFrame,
      nTables: Int = 8,
      nPlanes: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nTables, nPlanes, dim, seed)
    val tables = (0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        VectorExprs.hyperplaneBucket(col("embedding"), planes(t).toArray).as("bucket"))
    }
    emb.select(col("vec_id"), explode(array(tables: _*)).as("b"))
      .select(col("vec_id"), col("b.tbl"), col("b.bucket"))
  }

  /**
   * IVF coarse quantizer: k centroids from seeded Lloyd iterations
   * over a BOUNDED deterministic sample (the `sampleN` lowest
   * `xxhash64(vec_id)` rows — a distributed top-N, so the sample and
   * hence the centroids are identical at any corpus scale). The
   * sample is tiny (≤ sampleN × dim doubles) and Lloyd runs on the
   * driver in microseconds; the expensive part — assigning the corpus
   * to cells — is the fused IvfProbes codegen expression, one narrow
   * pass per row.
   */
  def ivfCentroids(
      emb: DataFrame,
      nCells: Int = 16,
      iters: Int = 5,
      sampleN: Int = 1024): Array[Array[Double]] = {
    val sample = emb
      .orderBy(xxhash64(col("vec_id").cast("string")), col("vec_id"))
      .limit(sampleN)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= nCells, s"sample ${sample.length} < $nCells cells")
    var cents = sample.take(nCells).map(_.clone())
    val dim = sample.head.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Int](nCells)
      sample.foreach { v =>
        var best = 0; var bestCos = Double.MinValue
        var c = 0
        while (c < nCells) {
          var dot = 0.0; var nv = 0.0; var nc = 0.0
          var i = 0
          while (i < dim) { dot += v(i) * cents(c)(i); nv += v(i) * v(i); nc += cents(c)(i) * cents(c)(i); i += 1 }
          val cos = if (nv == 0.0 || nc == 0.0) 0.0 else dot / math.sqrt(nv * nc)
          if (cos > bestCos) { bestCos = cos; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(nCells)(c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its centroid (deterministic)
        else sums(c).map(_ / counts(c)))
    }
    cents
  }

  /** (vec_id, cell) corpus assignment under the IVF quantizer. */
  def ivfCells(emb: DataFrame, cents: Array[Array[Double]]): DataFrame =
    emb.select(col("vec_id"),
      element_at(graft.functions.VectorExprs.ivfProbes(col("embedding"), cents, 1), 1)
        .as("cell"))

  /** (q_id, cell) probe list per query: the nProbe nearest cells. */
  def ivfProbeRows(queries: DataFrame, cents: Array[Array[Double]], nProbe: Int): DataFrame =
    queries.select(col("vec_id").as("q_id"),
      explode(graft.functions.VectorExprs.ivfProbes(col("embedding"), cents, nProbe))
        .as("cell"))

  /**
   * IVF approximate top-k — the second sub-quadratic scale path next
   * to [[lshTopK]] (coarse-quantizer partitioning instead of random
   * hyperplanes): queries scan only their nProbe nearest cells
   * (~nProbe/nCells of the corpus), exact cosine ranking within.
   * Fully deterministic (seeded sample → fixed centroids).
   */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cents = ivfCentroids(corpus, nCells)
    val cells = ivfCells(corpus, cents)
    val cand = ivfProbeRows(queries, cents, nProbe)
      .join(cells, Seq("cell"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .filter(col("q_id") =!= col("n_id"))
    val scored = cand
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("qv")), Seq("q_id"))
      .join(corpus.select(col("vec_id").as("n_id"), col("embedding").as("nv")), Seq("n_id"))
      .withColumn("cos", VectorExprs.cosineSim(col("qv"), col("nv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"), col("n_id"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Approximate top-k: exact ranking restricted to bucket-sharing
    * candidates. Misses are possible by design; RecallSpec pins the
    * measured recall vs [[bruteTopK]] on the fixed corpus. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nTables: Int = 8,
      nPlanes: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val cb = lshCandidates(corpus, nTables, nPlanes, dim, seed).toDF("n_id", "tbl", "bucket")
    val qb = lshCandidates(queries, nTables, nPlanes, dim, seed).toDF("q_id", "tbl", "bucket")
    val cand = qb.join(cb, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id")).dropDuplicates("q_id", "n_id")
    val scored = cand
      .join(queries.select(col("vec_id").as("q_id"), col("embedding").as("qv")), Seq("q_id"))
      .join(corpus.select(col("vec_id").as("n_id"), col("embedding").as("nv")), Seq("n_id"))
      .withColumn("cos", VectorExprs.cosineSim(col("qv"), col("nv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"), col("n_id"))
      .orderBy(col("q_id"), col("rank"))
  }
}
