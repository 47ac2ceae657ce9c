package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text/hash kernels for the training-data pipeline operators
  * (dedup, similarity, language-ID, quality scoring, fingerprinting).
  *
  * Every kernel here is composed from `org.apache.spark.sql.functions`
  * built-ins only — no UDFs — so the whole surface stays inside
  * whole-stage codegen, and every kernel has an exactly-equivalent DuckDB
  * SQL spelling (the `Dk` twins below) used by the driver's oracle check.
  * Hashes are built on `md5`, which both engines implement identically
  * (RFC 1321, lowercase hex), so signatures match bit-for-bit across
  * engines — that is what makes MinHash/SimHash oracle-checkable.
  */
object TextKernels {

  /** Whitespace tokenization. `trim` first so leading/trailing whitespace
    * can't produce empty edge tokens (Spark `split` and DuckDB
    * `string_split_regex` agree on interior behavior once trimmed). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word 3-gram shingles: the canonical unit for MinHash / Jaccard
    * near-dup detection. Empty when the doc has < 3 tokens (guard needed:
    * Spark `sequence(0, n)` with n < 0 would DESCEND, not return empty). */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** First 32 bits of md5 as a non-negative long in [0, 2^32). The
    * portable integer hash: both engines parse the same 8 hex chars of the
    * same digest. */
  def hex32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** MinHash family member j: lexicographic min of md5("<j>|" + shingle).
    * Min over lowercase-hex strings is identical in both engines (plain
    * byte order). Null when the shingle set is empty. */
  def minhash(shingles: Column, j: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$j|"), s))))

  /** LSH band hash over two adjacent minhash columns (bands of r=2). */
  def bandHash(mh0: Column, mh1: Column): Column = md5(concat(mh0, mh1))

  /** SimHash bit-j vote for one token hash h: +1 if bit j of h is set,
    * else -1. Portable bit extraction: floor-div by 2^j, mod 2 — h < 2^32
    * so the double division is exact (< 2^53). */
  def simhashVote(h: Column, j: Int): Column = {
    val bit = shiftright(h, j).bitwiseAND(lit(1L))
    bit * 2 - 1
  }

  /** Rolling polynomial fingerprint of a string: left fold over character
    * codes, acc = (acc * 31 + code) mod 1e9+7. Stays in whole-stage
    * codegen via the `aggregate` HOF. */
  def fingerprint(c: Column): Column =
    aggregate(
      transform(split(c, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, code) => (acc * 31 + code) % 1000000007L)

  /** Winnowing-style min char-8-gram digest: min over md5 of every 8-char
    * window. Null for strings shorter than 8 chars. */
  def winnowMin(c: Column): Column =
    when(length(c) >= 8,
      array_min(transform(sequence(lit(1), length(c) - 7), i => md5(substring(c, i, lit(8))))))
      .otherwise(lit(null).cast("string"))

  /** Language marker stopword lists (tiny, deterministic n-gram heuristic
    * — the operator contract, not a trained model). Alphabetical lang
    * order fixes argmax tie-breaks. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "fr" -> Seq("le", "les", "des", "de", "et"))

  /** Count of tokens contained in a marker list (multiset semantics:
    * every occurrence counts). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))

  // -----------------------------------------------------------------------
  // DuckDB SQL twins — fragment builders so the oracle text can't drift
  // from the Spark expression semantics. `e` is a SQL expression string.
  // -----------------------------------------------------------------------
  object Dk {
    def tokens(e: String): String = s"string_split_regex(trim($e), '\\s+')"

    /** toks must be a list-typed SQL expression (bind it in a CTE). */
    def shingles3(toks: String): String =
      s"[array_to_string($toks[i:i+2], ' ') for i in generate_series(1, len($toks)-2)]"

    /** 8-nibble hex→int, identical to [[hex32]]. */
    def hex32(e: String): String =
      (1 to 8).map { i =>
        val w = 1L << (4 * (8 - i))
        s"(instr('0123456789abcdef', substr(md5($e), $i, 1)) - 1) * ${w}::BIGINT"
      }.mkString("(", " + ", ")")

    def minhash(shingles: String, j: Int): String =
      s"list_aggregate([md5('$j|' || s) for s in $shingles], 'min')"

    def fingerprint(e: String): String =
      s"list_reduce(list_prepend(0::BIGINT, [ascii(substr($e, i, 1))::BIGINT for i in generate_series(1, len($e))]), " +
        "(acc, code) -> (acc * 31 + code) % 1000000007)"

    def winnowMin(e: String): String =
      s"case when len($e) >= 8 then list_aggregate([md5(substr($e, i, 8)) for i in generate_series(1, len($e)-7)], 'min') end"

    def markerHits(toks: String, markers: Seq[String]): String =
      s"len(list_filter($toks, t -> t in (${markers.map("'" + _ + "'").mkString(",")})))"
  }
}
