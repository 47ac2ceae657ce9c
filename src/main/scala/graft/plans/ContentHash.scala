package graft.plans

import graft.Document
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Content hash of a document, computable identically from BOTH sides:
  *
  *  - [[docHash]] — plain Scala, called inside the extraction kernel's
  *    `mapPartitions` (per-bucket manifest stats accumulate DURING the
  *    write pass — no second scan over the written output);
  *  - [[hashCol]] — a Column twin used by the orphan-adoption read-back
  *    path (and anything else that must recompute the hash from a stored
  *    table with a Spark job).
  *
  * Equality holds by construction, not by parallel implementations: both
  * sides hash the SAME canonical string with the SAME engine primitive —
  * Catalyst's `XxHash64Function` (what the SQL `xxhash64` compiles to,
  * seed 42) — so there is exactly one hash algorithm in play.
  * `ContentHashSpec` pins the Scala/Column agreement.
  *
  * Canonical form: `doc_id <NUL> span (<STX> span)*` where each span is
  * `kind <SOH> text <SOH> media_ref <SOH> offset` and any null field is
  * the sentinel `<ETX>` (concat with explicit per-field coalesce — never
  * concat_ws, whose null-SKIPPING would make "null field" and "absent
  * field" collide).
  */
object ContentHash {

  private val DocSep   = "\u0000"
  private val FieldSep = "\u0001"
  private val SpanSep  = "\u0002"
  private val NullMark = "\u0003"

  def canonical(d: Document): String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append(if (d.doc_id == null) NullMark else d.doc_id).append(DocSep)
    val spans = if (d.spans == null) Nil else d.spans
    var first = true
    spans.foreach { s =>
      if (!first) sb.append(SpanSep)
      first = false
      sb.append(if (s.kind == null) NullMark else s.kind).append(FieldSep)
        .append(if (s.text == null) NullMark else s.text).append(FieldSep)
        .append(if (s.media_ref == null) NullMark else s.media_ref).append(FieldSep)
        .append(s.offset)
    }
    sb.toString
  }

  /** XXH64(canonical, seed 42) — identical to `xxhash64(<canonical col>)`. */
  def docHash(d: Document): Long =
    XxHash64Function.hash(UTF8String.fromString(canonical(d)), StringType, 42L)

  /** Column spelling of [[canonical]] over a (doc_id, spans) row. */
  def canonicalCol: Column = {
    def f(s: Column, name: String): Column =
      coalesce(s.getField(name).cast("string"), lit(NullMark))
    concat(
      coalesce(col("doc_id").cast("string"), lit(NullMark)), lit(DocSep),
      coalesce(
        array_join(transform(col("spans"), s =>
          concat(f(s, "kind"), lit(FieldSep),
            f(s, "text"), lit(FieldSep),
            f(s, "media_ref"), lit(FieldSep),
            f(s, "offset"))), SpanSep),
        lit("")))
  }

  /** Column twin of [[docHash]]. */
  def hashCol: Column = xxhash64(canonicalCol)
}
