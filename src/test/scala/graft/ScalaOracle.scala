package graft

import graft.model._

/**
 * Straight-line Scala reimplementation of the extraction semantics
 * (SURVEY §7 "graft.gen golden oracle") — deliberately naive,
 * single-threaded, and structured like the reference's execution
 * (block split → per-part extract → nil-omission → ordering), NOT like
 * the Catalyst compiler, so agreement between the two is meaningful.
 */
object ScalaOracle {

  import TokenCodec._

  final case class Block(blockIdx: Int, tokens: Array[Int])

  def segment(tokens: Array[Int]): Seq[Block] = {
    val starts = tokens.indices.filter(tokens(_) == RECORD_START)
    if (starts.isEmpty) Seq(Block(0, tokens))
    else {
      val bounds = starts :+ tokens.length
      bounds.zip(bounds.tail).zipWithIndex.map { case ((a, b), i) =>
        Block(i, tokens.slice(a + 1, b))
      }
    }
  }

  /** fields of a block: [tag payload* DELIM]* → (tag, payload) pairs */
  def fields(block: Array[Int]): Seq[(Int, Array[Int])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])]
    var start = 0
    var i = 0
    while (i < block.length) {
      if (block(i) == FIELD_DELIM) {
        if (i > start) out += ((block(start), block.slice(start + 1, i)))
        else if (i == start) out += ((-1, Array.empty[Int])) // degenerate
        start = i + 1
      }
      i += 1
    }
    out.toSeq.filter(_._1 >= 0)
  }

  def decodeText(payload: Array[Int]): String =
    payload.map(TokenCodec.decodeToken).mkString(" ")

  def applyFilters(s: String, fs: Seq[TextFilter]): String =
    fs.foldLeft(s) {
      case (x, TextFilter.Trim)       => x.trim
      case (x, TextFilter.Lower)      => x.toLowerCase
      case (x, TextFilter.Upper)      => x.toUpperCase
      case (x, TextFilter.Capitalize) =>
        x.split(" ", -1).map(w =>
          if (w.isEmpty) w else w.substring(0, 1).toUpperCase + w.substring(1).toLowerCase)
          .mkString(" ")
    }

  def patternPositions(payload: Array[Int], pattern: Seq[Int]): Seq[Int] =
    (0 to payload.length - pattern.length).filter(i =>
      pattern.indices.forall(k => payload(i + k) == pattern(k)))

  /** One extracted record per block: partName → value (None = nil-omitted). */
  def extract(blockTokens: Array[Int], spec: ExtractionSpec): Map[String, Any] = {
    val fs = fields(blockTokens)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    for (f <- spec.fields; t <- f.types) {
      val matched = fs.filter(_._1 == f.selector)
      val payloads = matched.map(_._2)
      val name = s"${f.name}_${t.name}"
      def guard(v: => Any): Option[Any] =
        if (matched.nonEmpty || f.includeIfEmpty) Some(v) else None
      t match {
        case ExtractorType.Text =>
          guard(payloads.map(p => applyFilters(decodeText(p), f.filters)))
            .foreach(out(name) = _)
        case ExtractorType.Tokens =>
          guard(payloads.map(_.toSeq)).foreach(out(name) = _)
        case ExtractorType.Count =>
          guard(matched.size).foreach(out(name) = _)
        case ExtractorType.Const(v) => out(name) = v
        case ExtractorType.TokenPattern(p) =>
          guard(payloads.flatMap(patternPositions(_, p))).foreach(out(name) = _)
        case ExtractorType.Path =>
          guard(payloads.map(decodeText)).foreach(out(s"__path_${f.name}") = _)
        case ExtractorType.Unknown(_) => // skipped
      }
    }
    out.toMap
  }

  /** Full pipeline for one doc: ordered (blockIdx, record) list. */
  def run(tokens: Array[Int], spec: ExtractionSpec): Seq[(Int, Map[String, Any])] =
    segment(tokens).map(b => (b.blockIdx, extract(b.tokens, spec)))
}
