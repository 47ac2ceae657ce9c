package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's complete scalar-function surface (SURVEY.md §2.7,
  * F1–F15), re-expressed as Catalyst Column builders. Everything here is
  * composed from `org.apache.spark.sql.functions` built-ins, so every
  * kernel stays inside whole-stage codegen — no UDFs, no codegen breaks in
  * the hot path.
  *
  * Exact reference semantics preserved (file:line cites are into
  * /root/reference/):
  */
object Kernels {

  /** F1 `clean_newlines` — newline runs become single spaces
    * (field_extractor_gemini.py:26-33). */
  def cleanNewlines(c: Column): Column = regexp_replace(c, "\n", " ")

  /** F2 `_strip_code_fences` — if the text starts with ``` drop the first
    * line and a trailing fence; else identity
    * (field_extractor_gemini.py:35-52; gpt variant :129-138). */
  def stripCodeFences(c: Column): Column =
    when(c.startsWith("```"),
      regexp_replace(regexp_replace(c, "(?s)^```[^\n]*\n?", ""), "(?s)\n?```\\s*$", ""))
      .otherwise(c)

  /** F3 `_stringify_values` for one scalar leaf — NULL→"", else string
    * (field_extractor_gemini.py:54-61). */
  def stringify(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Shared number-lexing step: trim, strip OUTER parens only (any run of
    * '('/')' at either end — the reference uses str.strip("()")), remove
    * commas, drop single underscores between digits (Python numeric
    * literal support in float()). Inner whitespace is NOT removed:
    * "1 234" is not a number, matching Python float(). */
  private def numLex(c: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(trim(c), "^[()]+|[()]+$", ""), ",", ""),
      "(?<=[0-9])_(?=[0-9])", "")

  private def numNeg(c: Column): Column =
    trim(c).startsWith("(") && trim(c).endsWith(")")

  /** Python-float() cast: handles "inf"/"nan" spellings Java's parser
    * doesn't; everything else through try_cast (null on failure). */
  private def pyFloat(c: Column): Column = {
    val s   = trim(numLex(c))
    val low = lower(s)
    when(low.isin("inf", "+inf", "infinity", "+infinity"), lit(Double.PositiveInfinity))
      .when(low.isin("-inf", "-infinity"), lit(Double.NegativeInfinity))
      .when(low.isin("nan", "+nan", "-nan"), lit(Double.NaN))
      .otherwise(s.try_cast("double"))
  }

  /** F4 `parse_number` — trim; "(x)" means negative; strip commas; double;
    * unparseable/empty → 0.0 (convert_ground_truth.py:46-58). */
  def parseNumber(c: Column): Column = {
    val v = pyFloat(c)
    coalesce(when(numNeg(c), -v).otherwise(v), lit(0.0))
  }

  /** F5 `_try_parse_number` ok-flag — parses like F4 but failure is a flag,
    * not 0.0 (eval_script_field_level.py:104-118). NULL input → false. */
  def isNumber(c: Column): Column = pyFloat(c).isNotNull

  /** F6 `num_equal` — both numeric ∧ Python math.isclose(abs_tol=0.01):
    * |a−b| ≤ max(1e-9·max(|a|,|b|), 0.01) — the default rel_tol survives
    * (eval_script_field_level.py:120-125). */
  def numEqual(a: Column, b: Column): Column = {
    val (pa, pb) = (parseNumber(a), parseNumber(b))
    val inf      = lit(Double.PositiveInfinity)
    // isclose: exact-equality shortcut first (covers inf==inf), then the
    // tolerance test only for finite operands (inf vs finite is never close).
    // NaN guard needed: Spark SQL's === treats NaN = NaN as TRUE, Python's
    // == does not.
    isNumber(a) && isNumber(b) && !isnan(pa) && !isnan(pb) &&
      ((pa === pb) ||
        (abs(pa) =!= inf && abs(pb) =!= inf &&
          abs(pa - pb) <= greatest(lit(0.01), lit(1e-9) * greatest(abs(pa), abs(pb)))))
  }

  /** F7 `normalize_str` — NULL→""; strip, lower, collapse whitespace runs
    * (eval_script_field_level.py:127-132). */
  def normalizeStr(c: Column): Column =
    regexp_replace(lower(trim(coalesce(c.cast("string"), lit("")))), "\\s+", " ")

  /** F8 `scalar_equal` — empty-STRING-GT wildcard (P4, :134-137; a NULL gt
    * is NOT a wildcard — isinstance(gt, str) fails and it falls through to
    * the string branch where norm(None)=""); both-numeric → F6; else
    * normalized string equality (eval_script_field_level.py:134-142). */
  def scalarEqual(gt: Column, pred: Column): Column =
    when(gt.isNotNull && normalizeStr(gt) === "", lit(true))
      .when(isNumber(gt) && isNumber(pred), numEqual(gt, pred))
      .otherwise(normalizeStr(gt) === normalizeStr(pred))

  /** F9 `normalize_subcat` — upper; non-alnum runs→"_"; collapse; strip
    * edge underscores (convert_ground_truth.py:39-44). */
  def normalizeSubcat(c: Column): Column =
    regexp_replace(
      regexp_replace(upper(coalesce(c, lit(""))), "[^A-Z0-9]+", "_"),
      "^_+|_+$", "")

  /** F10 `parse_qty` — F4 then integral check (convert_ground_truth.py:60-62).
    * Kept as double (int-if-integral is a render concern downstream);
    * `parseQtyIsIntegral` exposes the distinction. */
  def parseQty(c: Column): Column = parseNumber(c)
  def parseQtyIsIntegral(c: Column): Column = {
    val n = parseNumber(c)
    n === floor(n)
  }

  /** F11 `_get_ci` — case-insensitive map-key lookup via upstream key
    * normalization (eval_script_field_level.py:290-297). */
  def normalizeKeys(m: Column): Column = transform_keys(m, (k, _) => lower(trim(k)))
  def getCi(m: Column, key: String): Column = element_at(normalizeKeys(m), key.trim.toLowerCase)

  /** F13 `json_repair` fallback (field_extractor_gemini.py:185-193,
    * field_extractor_gpt.py:140-148): the common LLM-JSON damage fixable
    * by regex — markdown fences, unquoted object keys, trailing commas.
    * Truncation recovery needs stateful bracket balancing and lives in
    * [[scala_.repairJson]] (the typed eval path). Best-effort by design:
    * meant to run only after a strict parse returned null, like the
    * reference's json_repair fallback; the key-quoting regex can touch
    * `key:`-shaped text inside string values, which well-formed input
    * never reaches because the strict parse already succeeded on it. */
  def repairJson(c: Column): Column =
    regexp_replace(
      regexp_replace(stripCodeFences(c),
        "([{,]\\s*)([A-Za-z_][A-Za-z0-9_]*)\\s*:", "$1\"$2\":"),
      ",(\\s*[}\\]])", "$1")

  /** F14 leaf-value canonicalization — stable JSON of a struct as multiset
    * key (eval_script_field_level.py:272,275). Field order = schema order,
    * which is fixed, so equal values serialize equally. */
  def canonical(c: Column): Column = to_json(c)

  /** F15 basename/stem extraction as join key
    * (eval_script_field_level.py:459). */
  def docStem(path: Column): Column =
    regexp_extract(path, "([^/]+?)(\\.[A-Za-z0-9]+)?$", 1)

  // ---------------------------------------------------------------------
  // Plain-Scala twins for the kernels the typed extraction/eval code uses
  // outside Catalyst (mapPartitions); semantics identical to the Column
  // builders above and covered by the same specs.
  // ---------------------------------------------------------------------
  object scala_ {
    def cleanNewlines(s: String): String = s.replace("\n", " ")

    def normalizeStr(s: String): String =
      Option(s).getOrElse("").trim.toLowerCase.replaceAll("\\s+", " ")

    private def numLex(s: String): (Boolean, String) = {
      val t   = s.trim
      val neg = t.startsWith("(") && t.endsWith(")")
      (neg, t.replaceAll("^[()]+|[()]+$", "").replace(",", ""))
    }

    /** Python float(): also accepts "inf"/"nan" spellings and single
      * underscores between digits. */
    private def pyFloat(d: String): Option[Double] = {
      val t = d.trim
      t.toLowerCase match {
        case "inf" | "+inf" | "infinity" | "+infinity" => Some(Double.PositiveInfinity)
        case "-inf" | "-infinity"                      => Some(Double.NegativeInfinity)
        case "nan" | "+nan" | "-nan"                   => Some(Double.NaN)
        case _ if t.matches("(?i).*[dfx].*") =>
          None // Java parseDouble accepts "5d"/"5f"/hex floats; Python doesn't
        case _ =>
          try Some(t.replaceAll("(?<=[0-9])_(?=[0-9])", "").toDouble)
          catch { case _: NumberFormatException => None }
      }
    }

    def tryParseNumber(s: String): Option[Double] =
      Option(s).flatMap { raw =>
        val (neg, d) = numLex(raw)
        pyFloat(d).map(v => if (neg) -v else v)
      }

    def parseNumber(s: String): Double = tryParseNumber(s).getOrElse(0.0)

    /** math.isclose(a, b, abs_tol=0.01) with default rel_tol=1e-09:
      * exact equality first (inf==inf), tolerance only for finite pairs. */
    def isClose(x: Double, y: Double): Boolean =
      x == y || (!x.isInfinite && !y.isInfinite &&
        (x - y).abs <= math.max(0.01, 1e-9 * math.max(x.abs, y.abs)))

    def numEqual(a: String, b: String): Boolean =
      (tryParseNumber(a), tryParseNumber(b)) match {
        case (Some(x), Some(y)) => isClose(x, y)
        case _                  => false
      }

    /** F8 composite equality with the P4 empty-STRING-GT wildcard (a null
      * gt is not a wildcard; it string-compares as ""). */
    def scalarEqual(gt: String, pred: String): Boolean = {
      if (gt != null && gt.trim.isEmpty) true
      else (tryParseNumber(Option(gt).getOrElse("")), tryParseNumber(Option(pred).getOrElse(""))) match {
        case (Some(x), Some(y)) => isClose(x, y)
        case _                  => normalizeStr(gt) == normalizeStr(pred)
      }
    }

    def normalizeSubcat(s: String): String =
      Option(s).getOrElse("").toUpperCase
        .replaceAll("[^A-Z0-9]+", "_")
        .replaceAll("^_+|_+$", "")

    def parseQty(s: String): Either[Long, Double] = {
      val n = parseNumber(s)
      if (n == math.floor(n) && !n.isInfinite) Left(n.toLong) else Right(n)
    }

    /** F13 `json_repair` — full variant for the typed eval path: fence
      * strip + key quoting + trailing-comma removal (as the Column twin)
      * PLUS truncation recovery: close an unterminated string, drop a
      * dangling comma / complete a dangling colon, and append the closers
      * the bracket stack still owes. Intended as a fallback after strict
      * parsing failed (field_extractor_gemini.py:185-193 semantics). */
    def repairJson(s: String): String = {
      val f = Option(s).getOrElse("").trim
      val noFence =
        if (f.startsWith("```"))
          f.replaceAll("(?s)^```[^\n]*\n?", "").replaceAll("(?s)\n?```\\s*$", "")
        else f
      val regexed = noFence
        .replaceAll("([{,]\\s*)([A-Za-z_][A-Za-z0-9_]*)\\s*:", "$1\"$2\":")
        .replaceAll(",(\\s*[}\\]])", "$1")
      // bracket/string balancing for truncated output
      var inStr = false
      var esc   = false
      val stack = scala.collection.mutable.Stack.empty[Char]
      regexed.foreach { ch =>
        if (inStr) {
          if (esc) esc = false
          else if (ch == '\\') esc = true
          else if (ch == '"') inStr = false
        } else ch match {
          case '"'       => inStr = true
          case '{'       => stack.push('}')
          case '['       => stack.push(']')
          case '}' | ']' => if (stack.nonEmpty && stack.top == ch) { stack.pop(); () }
          case _         =>
        }
      }
      val closedStr = if (inStr) regexed + "\"" else regexed
      val t         = closedStr.trim.replaceAll("[\\s]+$", "")
      val completed =
        if (t.endsWith(":")) t + " null"
        else if (t.endsWith(",")) t.dropRight(1)
        else t
      completed + stack.mkString // Stack iterates top-first: innermost closes first
    }
  }
}
