package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/**
 * Deduplication operators for a training-data pipeline over the
 * `documents` table `(doc_id, text, lang, source, n_chars)` — the
 * cross-run analog of the reference's frontier dedup (payload/URL
 * hash keys, scrape/scrape.go:44-48,100,611), widened to the
 * near-duplicate family a 100 TB corpus cleanup needs.
 *
 * Scale notes per operator:
 *  - exact: one hash-shuffle on the 16-byte digest, partial agg
 *    map-side; the text column never shuffles (hash computed first).
 *  - MinHash/LSH: signatures are computed NARROW (higher-order
 *    aggregate per row, no explode/shuffle); only (doc_id, band_key)
 *    pairs — k ints per doc — shuffle for bucketing. Candidate
 *    verification joins shingle SETS only for candidate pairs, never
 *    all pairs: O(n²) is avoided unless the data is pathologically
 *    self-similar.
 *  - SimHash: one 8-byte signature per doc via a codegen'd custom
 *    expression; banding by 16-bit sub-keys (pigeonhole: hamming ≤ 3
 *    ⇒ at least one of 4 bands equal), verify with bit_count(xor).
 *  - embedding near-dup: block-nested-loop with the smaller side
 *    broadcast; at cluster scale replace the broadcast with the LSH
 *    bucketing of [[Similarity.lshCandidates]].
 */
object Dedup {

  /** Exact dedup by content hash: canonical row = min doc_id per
    * digest (deterministic winner, like the reference's first-write-
    * wins KV key). */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))

  /** Whitespace word split (kept identical to the DuckDB oracle's
    * string_split: empty strings preserved). */
  def words(textCol: Column): Column = split(textCol, " ")

  /** Distinct n-word shingles of a document, as strings. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val w = words(textCol)
    array_distinct(
      when(size(w) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(0), size(w) - n), i =>
          concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))))
  }

  /** doc_id + distinct shingle set (shared by jaccard + minhash). */
  def shingleSets(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), shingles(col("text"), n).as("sh"))

  /**
   * Exact n-gram Jaccard pairs via inverted index: explode shingles,
   * self-join on shingle (equi-join — NOT a cross join), count
   * intersections, compute |A∪B| from set sizes. Only documents
   * sharing ≥1 shingle ever meet. Emits (d1, d2, inter, n1, n2) for
   * pairs with Jaccard ≥ threshold; d1 < d2.
   */
  def jaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.2): DataFrame = {
    val sets = shingleSets(docs, n).cache()
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val inv = sets.select(col("doc_id"), explode(col("sh")).as("s"))
    val a = inv.toDF("d1", "s")
    val b = inv.toDF("d2", "s")
    val inter = a.join(b, Seq("s")).filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("d1", "n1"), Seq("d1"))
      .join(sizes.toDF("d2", "n2"), Seq("d2"))
      .filter(col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")) >= threshold)
      .select(col("d1"), col("d2"), col("inter"), col("n1"), col("n2"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Mersenne prime 2^31-1: universal-hash modulus small enough that
    * a*h+b never overflows a long (ANSI mode turns silent wrap into a
    * runtime error, so the classic mod-2^64 trick is out). */
  private val MinhashP = 2147483647L

  /** Deterministic MinHash permutation parameters (seeded; a ∈ [1,p),
    * b ∈ [0,p)). */
  private[pipeline] def minhashParams(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rng = new graft.gen.TokenGen.Rng(seed)
    Seq.fill(k)((1L + (rng.nextLong() >>> 33) % (MinhashP - 1),
      (rng.nextLong() >>> 33) % MinhashP))
  }

  /**
   * MinHash signatures computed narrow (no shuffle): per permutation
   * i, sig[i] = (a_i * h + b_i) mod p minimized over shingle hashes
   * h = xxhash64(sh) mod p. All intermediates < 2^62 — no overflow.
   */
  def minhashSignature(sh: Column, k: Int = 32, seed: Long = 42L): Column = {
    val params = minhashParams(k, seed)
    val hashes = transform(sh, s => pmod(xxhash64(s), lit(MinhashP)))
    array(params.map { case (a, b) =>
      coalesce(
        array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(MinhashP)))),
        lit(Long.MaxValue))
    }: _*)
  }

  /**
   * MinHash + LSH banding: k=bands*rows signature, band key =
   * murmur hash of the band's slice; docs sharing any band key are
   * candidates; candidates verified with EXACT Jaccard on the shingle
   * sets (array_intersect — only for candidate pairs). Returns
   * verified pairs with Jaccard ≥ threshold.
   */
  def minhashLsh(
      docs: DataFrame,
      n: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    val k = bands * rowsPerBand
    val sets = shingleSets(docs, n).filter(size(col("sh")) > 0).cache()
    val sig = sets.select(col("doc_id"), col("sh"),
      minhashSignature(col("sh"), k, seed).as("sig"))
    val banded = sig.select(col("doc_id"), col("sh"),
      explode(array((0 until bands).map(bIdx =>
        struct(lit(bIdx).as("band"),
          hash(slice(col("sig"), bIdx * rowsPerBand + 1, rowsPerBand)).as("bkey"))): _*))
        .as("b"))
      .select(col("doc_id"), col("sh"), col("b.band"), col("b.bkey"))
    val l = banded.toDF("d1", "sh1", "band", "bkey")
    val r = banded.toDF("d2", "sh2", "band", "bkey")
    val cand = l.join(r, Seq("band", "bkey")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("sh1"), col("sh2"))
      .dropDuplicates("d1", "d2")
    cand
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jacc", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jacc") >= threshold)
      .select(col("d1"), col("d2"), col("inter"),
        size(col("sh1")).as("n1"), size(col("sh2")).as("n2"))
      .orderBy(col("d1"), col("d2"))
  }

  /** SimHash near-dup pairs: 64-bit signature per doc (codegen'd
    * custom expression), banded into 4×16-bit keys (pigeonhole
    * guarantee for hamming ≤ 3), verified with bit_count(xor) ≤
    * maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col("doc_id"),
      VectorExprs.simhash64(words(col("text"))).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("sig"), i * 16).bitwiseAND(lit(0xffffL)).as("bkey"))): _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band"), col("b.bkey"))
    val l = banded.toDF("d1", "sig1", "band", "bkey")
    val r = banded.toDF("d2", "sig2", "band", "bkey")
    l.join(r, Seq("band", "bkey")).filter(col("d1") < col("d2"))
      .dropDuplicates("d1", "d2")
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Embedding-cosine near-dup pairs (exact): id-ordered self-join
    * with the right side broadcast; cosine via the codegen'd custom
    * expression. At cluster scale swap the broadcast for LSH
    * bucketing (Similarity.lshCandidates) — exactness then holds only
    * within buckets, which is the standard trade. */
  def embedNearDup(emb: DataFrame, threshold: Double = 0.45): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .filter(VectorExprs.cosineSim(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
