package graft.model

/**
 * Declarative extraction spec — the engine's "query language".
 *
 * Recast of the reference's `Payload`/`Field`/`Extractor` structs
 * (reference: scrape/structure.go:65-105, 44-61) over pre-tokenized
 * sequences. A spec compiles (at plan time, like `fields2parts`,
 * scrape/scrape.go:220-261) into pure Catalyst `Column` expressions —
 * no per-row closures, so whole-stage codegen & pushdown stay intact.
 *
 * Token-domain document layout (the analog of an HTML page):
 *
 * {{{
 *   doc    := block+
 *   block  := RECORD_START field*
 *   field  := tag payload* FIELD_DELIM
 * }}}
 *
 * where RECORD_START=2 (the repeating container found by
 * DividePageByIntersection in the reference, scrape/divide.go:45-95),
 * FIELD_DELIM=1 terminates a field, `tag` ∈ [3,63] plays the role of a
 * CSS selector target, and payload tokens are ≥ 64.
 */
object TokenCodec {
  val PAD: Int = 0
  val FIELD_DELIM: Int = 1
  val RECORD_START: Int = 2
  val MIN_TAG: Int = 3
  val MAX_TAG: Int = 63
  val MIN_PAYLOAD: Int = 64
  val VOCAB: Int = 32768

  /** Deterministic token → word decode (shared by engine and oracle):
    * base-36, uppercase — gives the string filters (lower/upper/
    * capitalize, reference extract/filters.go:7-21) something to do. */
  def decodeToken(t: Int): String =
    java.lang.Long.toString(t.toLong, 36).toUpperCase
}

/** Extractor types — ports of reference extract/extractors.go dispatch
  * (scrape/scrape.go:263-322). Token-domain analogs per SURVEY §2.2. */
sealed trait ExtractorType { def name: String }
object ExtractorType {
  /** decoded text of matched fields (analog of Text, extractors.go:53-88) */
  case object Text extends ExtractorType { val name = "text" }
  /** verbatim token payload — the token-array-equality column
    * (analog of OuterHtml, extractors.go:131-145) */
  case object Tokens extends ExtractorType { val name = "tokens" }
  /** number of matched fields (analog of Count, extractors.go:313-331) */
  case object Count extends ExtractorType { val name = "count" }
  /** constant value per block (analog of Const, extractors.go:39-47) */
  final case class Const(value: String) extends ExtractorType { val name = "const" }
  /** token-pattern find-all: 0-based start offsets of a contiguous
    * subsequence within each matched payload (analog of Regex,
    * extractors.go:150-246) */
  final case class TokenPattern(pattern: Seq[Int]) extends ExtractorType { val name = "pattern" }
  /** link-key projection for details traversal (analog of `path`,
    * scrape.go:270-274) — not emitted to output, feeds the join */
  case object Path extends ExtractorType { val name = "path" }
  /** unknown types are skipped with a log, scrape.go:317-319 */
  final case class Unknown(name: String) extends ExtractorType
}

/** String filters applied to Text extraction, chained left-to-right,
  * case-insensitive names (reference extract/filters.go:7-21). */
sealed trait TextFilter
object TextFilter {
  case object Trim extends TextFilter
  case object Lower extends TextFilter
  case object Upper extends TextFilter
  case object Capitalize extends TextFilter
  def parse(s: String): Option[TextFilter] = s.toLowerCase match {
    case "trim"       => Some(Trim)
    case "lowercase"  => Some(Lower)
    case "uppercase"  => Some(Upper)
    case "capitalize" => Some(Capitalize)
    case _            => None
  }
}

/**
 * One extraction rule (reference `Field`, structure.go:52-61).
 *
 * @param name     output column prefix; part columns are `<name>_<type>`
 *                 (scrape.go:233-235)
 * @param selector field tag to match (the CSS-selector analog)
 * @param types    extractor types (cross product per fields2parts)
 * @param filters  text filter chain
 * @param includeIfEmpty if false (default), zero matches → null column
 *                 (nil-omission, extractors.go:77-79)
 * @param details  nested spec: extracted Path keys join a child stream
 *                 (scrape.go:586-654)
 */
final case class FieldSpec(
    name: String,
    selector: Int,
    types: Seq[ExtractorType],
    filters: Seq[TextFilter] = Nil,
    includeIfEmpty: Boolean = false,
    details: Option[ExtractionSpec] = None)

/** The query (reference `Payload`, structure.go:65-105). */
final case class ExtractionSpec(
    name: String,
    fields: Seq[FieldSpec],
    maxPages: Int = 0, // 0 = unlimited (scrape.go:402-403)
    isPath: Boolean = false) {

  /** CRC32(MD5(spec)) — key-parity with the reference's PayloadMD5
    * recipe (scrape.go:44-48, 100). */
  def uid: Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(this.toString.getBytes("UTF-8"))
    val crc = new java.util.zip.CRC32()
    crc.update(md5)
    crc.getValue
  }
}

final class SpecException(msg: String) extends RuntimeException(msg)

object SpecValidator {
  /** Port of the reference's validation: non-empty name+selector per
    * part (scrape.go:249-259), ≥1 part overall (scrape.go:467-478). */
  def validate(spec: ExtractionSpec): Unit = {
    if (spec.fields.isEmpty) throw new SpecException("no parts found")
    spec.fields.foreach { f =>
      if (f.name.isEmpty) throw new SpecException("field name is empty")
      if (f.selector < TokenCodec.MIN_TAG || f.selector > TokenCodec.MAX_TAG)
        throw new SpecException(s"invalid selector tag ${f.selector} for field ${f.name}")
      if (f.types.isEmpty) throw new SpecException(s"no extractor types for field ${f.name}")
    }
    val known = spec.fields.flatMap(_.types).exists {
      case ExtractorType.Unknown(_) => false
      case _                        => true
    }
    if (!known) throw new SpecException("no parts found")
  }
}
