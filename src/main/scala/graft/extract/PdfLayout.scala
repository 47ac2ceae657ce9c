package graft.extract

/** PDF layout parsing: glyph-run clustering into reading-order blocks.
  *
  * The reference delegates PDF understanding to pdfplumber + the LLM
  * (/root/reference/field_extractor_gpt.py:13-19 extracts page text in
  * page order; the Gemini path ships raw bytes,
  * /root/reference/field_extractor_gemini.py:96-100). The rebuild's
  * deterministic analog (BASELINE.json north_rule: "PDF layout parsing
  * (glyph-run clustering into reading-order blocks)"):
  *
  *   glyph runs --(same-column, y-proximity)--> lines
  *   lines      --(vertical-gap threshold)----> blocks
  *   blocks ordered by (column, top-y, x)  — standard multi-column
  *   reading order, as described in public layout-analysis literature
  *   (XY-cut family).
  *
  * Run wire format (ours, synthetic): span.text = "<x> <y> <words...>",
  * x/y non-negative integer page coordinates. Pure function, no Spark.
  */
object PdfLayout {

  final case class GlyphRun(x: Int, y: Int, text: String)

  /** Page geometry used for column detection. Synthetic pages are 1000
    * units wide; a run belongs to column 1 iff its x starts past midline. */
  val PageWidth = 1000
  val ColumnSplitX: Int = PageWidth / 2

  /** Vertical gap (in page units) above which consecutive lines start a
    * new block. */
  val BlockGapY = 30

  /** Lines whose y differ by at most this are the same line. */
  val LineTolY = 3

  // precompiled: String.split("\\s+", 3) would recompile per run
  private val WsPat = java.util.regex.Pattern.compile("\\s+")

  /** Parse "x y words..." — returns None for malformed runs (dropped,
    * mirroring the reference's skip-and-continue error policy,
    * /root/reference/eval_script_field_level.py:461-463). */
  def parseRun(raw: String): Option[GlyphRun] = {
    val parts = WsPat.split(raw.trim, 3)
    if (parts.length < 3) None
    else
      try Some(GlyphRun(parts(0).toInt, parts(1).toInt, parts(2)))
      catch { case _: NumberFormatException => None }
  }

  private def column(r: GlyphRun): Int = if (r.x < ColumnSplitX) 0 else 1

  /** Cluster glyph runs into reading-order block texts.
    *
    * Deterministic regardless of input order: ordering authority is only
    * the coordinates (SURVEY.md §7.5 item 1 — never rely on partition or
    * iteration order). Ties broken by (x, text) for total order.
    */
  def extract(rawRuns: Seq[String]): Seq[String] = {
    val runs = rawRuns.flatMap(parseRun)
    if (runs.isEmpty) return Nil

    // group into (column) -> sorted by y, then x, then text (total order)
    val byColumn = runs.groupBy(column).toSeq.sortBy(_._1)
    val out      = Seq.newBuilder[String]

    byColumn.foreach { case (_, colRuns) =>
      val sorted = colRuns.sortBy(r => (r.y, r.x, r.text))
      // lines: merge runs with |y - lineY| <= LineTolY
      val lines = Seq.newBuilder[(Int, String)] // (y of line, text)
      var lineY = Integer.MIN_VALUE
      var lineBuf: List[GlyphRun] = Nil
      def flushLine(): Unit = if (lineBuf.nonEmpty) {
        val lr = lineBuf.reverse.sortBy(r => (r.x, r.text))
        lines += ((lineY, lr.map(_.text).mkString(" ")))
        lineBuf = Nil
      }
      sorted.foreach { r =>
        if (lineBuf.isEmpty || (r.y - lineY).abs <= LineTolY) {
          if (lineBuf.isEmpty) lineY = r.y
          lineBuf = r :: lineBuf
        } else { flushLine(); lineY = r.y; lineBuf = r :: Nil }
      }
      flushLine()

      // blocks: split lines where the vertical gap exceeds BlockGapY
      var blockBuf: List[String] = Nil
      var prevY                  = Integer.MIN_VALUE
      def flushBlock(): Unit = if (blockBuf.nonEmpty) {
        out += blockBuf.reverse.mkString(" ")
        blockBuf = Nil
      }
      lines.result().foreach { case (y, text) =>
        if (blockBuf.nonEmpty && y - prevY > BlockGapY) flushBlock()
        blockBuf = text :: blockBuf
        prevY = y
      }
      flushBlock()
    }
    out.result()
  }
}
