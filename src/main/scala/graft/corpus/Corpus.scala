package graft.corpus

import graft.{Document, Span}
import graft.Span.Kind
import scala.util.Random

/** Deterministic synthetic corpus of interleaved text+media documents,
  * with golden (expected-extraction) outputs built alongside.
  *
  * Mirrors the reference's golden-file strategy: one golden per document,
  * equality is the oracle (/root/reference/eval_script_field_level.py:
  * 100-102, 208-288). Goldens here are correct *by construction*: every
  * generated HTML block is unambiguously content (>40 words, zero link
  * density) or unambiguously boilerplate (link density 1.0) under the
  * WSDM-2010 rules in [[graft.extract.Boilerplate]], and every PDF block
  * has clear column separation and super-threshold vertical gaps, so the
  * expected output is known without running the kernel.
  *
  * Generation is a pure function of (docIdx, seed) — no driver-side state
  * — so the corpus is generated *distributed* via `spark.range(n).map`,
  * which is the only pattern that survives 10^12 documents (never collect
  * or broadcast a corpus).
  *
  * Doc-type mix includes the skew/robustness cases FIXTURES.md §1 demands:
  * boilerplate-heavy HTML, multi-column PDF, media-interleaved, empty, and
  * mega documents (skew for salted repartitioning).
  */
object Corpus {

  private val Vocab: IndexedSeq[String] = IndexedSeq(
    "data", "span", "block", "table", "query", "merge", "sort", "scan",
    "join", "batch", "stream", "window", "column", "row", "vector", "hash",
    "filter", "order", "group", "value", "key", "line", "page", "text",
    "media", "image", "content", "main", "body", "article", "section",
    "claim", "bill", "total", "amount", "charge", "fee", "room", "service")

  private val BoilerVocab: IndexedSeq[String] = IndexedSeq(
    "home", "about", "login", "next", "prev", "contact", "terms", "privacy",
    "subscribe", "share", "menu", "footer", "nav", "sitemap")

  /** Multilingual content vocabulary for the UTF-8 corpus slot (%100=67):
    * CJK (3-byte UTF-8), Cyrillic (2-byte), precomposed Latin accents, and
    * a 4-byte emoji (a surrogate PAIR in JVM strings — any kernel counting
    * UTF-16 units instead of words/codepoints breaks here). A real crawl
    * is multilingual; the extraction rules (word counts, link density,
    * whitespace collapse) must be script-agnostic. */
  private val Utf8Vocab: IndexedSeq[String] = IndexedSeq(
    "数据", "处理", "流水线", "模型", "字段", "表格", "合计", "金额",
    "données", "schéma", "café", "résumé", "обработка", "данные", "поток",
    "внимание", "🚀")

  private def mix(seed: Long, docIdx: Long): Long = {
    var z = seed + docIdx * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def words(rng: Random, n: Int, vocab: IndexedSeq[String] = Vocab): Seq[String] =
    Seq.fill(n)(vocab(rng.nextInt(vocab.length)))

  /** Unambiguous content block: >40 plain words, link density 0. */
  private def contentBlock(rng: Random, vocab: IndexedSeq[String] = Vocab): (String, String) = {
    val ws   = words(rng, 41 + rng.nextInt(40), vocab)
    val text = ws.mkString(" ")
    // raw html wraps it in a tag pair + stray whitespace to exercise
    // tag-stripping and whitespace collapse
    (s"<p>\n  $text\n</p>", text)
  }

  /** Unambiguous boilerplate block: every word inside an anchor. */
  private def boilerBlock(rng: Random): String = {
    val ws = words(rng, 2 + rng.nextInt(8), BoilerVocab)
    ws.map(w => s"""<a href="#$w">$w</a>""").mkString("<div>", " ", "</div>")
  }

  /** HTML doc: interleaved boiler/content blocks. Returns (input spans,
    * golden spans) without offsets assigned. */
  private def htmlDoc(rng: Random, blocks: Int,
      vocab: IndexedSeq[String] = Vocab): (Seq[Span], Seq[String]) = {
    val in     = Seq.newBuilder[Span]
    val golden = Seq.newBuilder[String]
    var off    = 0
    (0 until blocks).foreach { _ =>
      if (rng.nextDouble() < 0.55) {
        in += Span(Kind.Html, boilerBlock(rng), "", off)
      } else {
        val (raw, clean) = contentBlock(rng, vocab)
        in += Span(Kind.Html, raw, "", off)
        golden += clean
      }
      off += 1
    }
    (in.result(), golden.result())
  }

  /** PDF doc: 2 columns, blocks of 2-4 lines, lines of 3-7 word-runs.
    * Input runs are emitted shuffled; golden is reading order. */
  private def pdfDoc(rng: Random): (Seq[Span], Seq[String]) = {
    val runs   = Seq.newBuilder[String]
    val golden = Seq.newBuilder[String]
    (0 to 1).foreach { col =>
      val colBase = col * 500
      var y       = 10 + rng.nextInt(5)
      val nBlocks = 1 + rng.nextInt(3)
      (0 until nBlocks).foreach { _ =>
        val nLines    = 2 + rng.nextInt(3)
        val blockText = Seq.newBuilder[String]
        (0 until nLines).foreach { _ =>
          val nWords = 3 + rng.nextInt(5)
          val lineWs = words(rng, nWords)
          lineWs.zipWithIndex.foreach { case (w, k) =>
            runs += s"${colBase + 10 + k * 40} $y $w"
          }
          blockText += lineWs.mkString(" ")
          y += 10 // same block: gap <= BlockGapY
        }
        golden += blockText.result().mkString(" ")
        y += 60 // new block: gap > BlockGapY
      }
    }
    val shuffled = rng.shuffle(runs.result()).zipWithIndex.map { case (r, i) =>
      Span(Kind.PdfGlyphs, r, "", i)
    }
    (shuffled, golden.result())
  }

  /** Media-interleaved doc: text spans + image/table refs, ref_defs at the
    * end; ~1/4 of refs are dangling (dropped by resolution). Returns
    * (input spans, golden spans-without-offsets). */
  private def mediaDoc(rng: Random): (Seq[Span], Seq[Span]) = {
    val in     = Seq.newBuilder[Span]
    val golden = Seq.newBuilder[Span]
    val defs   = Seq.newBuilder[Span]
    var off    = 0
    var refIdx = 0
    (0 until 3 + rng.nextInt(6)).foreach { _ =>
      if (rng.nextDouble() < 0.6) {
        val raw = words(rng, 3 + rng.nextInt(10)).mkString("  ", " \n ", " ")
        in += Span(Kind.Text, raw, "", off)
        golden += Span(Kind.Text, raw.replaceAll("\\s+", " ").trim, "", 0)
      } else {
        val kind     = if (rng.nextBoolean()) Kind.Image else Kind.Table
        val name     = s"m$refIdx"
        val resolved = rng.nextDouble() < 0.75
        refIdx += 1
        in += Span(kind, "", name, off)
        if (resolved) {
          val uri = s"mem://media/$name"
          defs += Span(Kind.RefDef, s"$name -> $uri", "", 0)
          golden += Span(kind, "", uri, 0)
        }
      }
      off += 1
    }
    val defSpans = defs.result().zipWithIndex.map { case (s, i) => s.copy(offset = off + i) }
    (in.result() ++ defSpans, golden.result())
  }

  // --- adversarial cases (round 3) ---------------------------------------
  // The kernel is only as proven as the generator is mean: these cases sit
  // exactly ON the classifier/geometry thresholds, where an off-by-one in
  // the kernel flips the output. Goldens remain correct BY CONSTRUCTION —
  // derived analytically from the published rules, never by running the
  // kernel.

  /** Adversarial HTML: short plain blocks whose content-ness is decided
    * entirely by their FLANKING neighbors (the WSDM-2010 rules read
    * prev/next):
    *  - case A: a 5-16-word plain block flanked by long content IS content
    *    (prev.linkDensity 0 ≤ 0.5555 and prev.words 41+ > 4);
    *  - case B: the same-sized plain block flanked by link-dense furniture
    *    is BOILERPLATE (prev.linkDensity 1.0 > 0.5555, curr.words ≤ 40,
    *    next.words ≤ 9 < 17).
    * A kernel that ignores neighbor features passes the round-2 corpus
    * (every block there is independently unambiguous) but fails here. */
  private def adversarialHtmlDoc(rng: Random): (Seq[Span], Seq[String]) = {
    val in     = Seq.newBuilder[Span]
    val golden = Seq.newBuilder[String]
    var off    = 0
    def addBoiler(): Unit = { in += Span(Kind.Html, boilerBlock(rng), "", off); off += 1 }
    def addContent(): Unit = {
      val (raw, clean) = contentBlock(rng)
      in += Span(Kind.Html, raw, "", off); golden += clean; off += 1
    }
    def shortPlain(): (String, String) = {
      val t = words(rng, 5 + rng.nextInt(12)).mkString(" ")
      (s"<span>$t</span>", t)
    }
    (0 until 2 + rng.nextInt(3)).foreach { _ =>
      addContent() //                          case A: content-flanked short
      val (rawA, cleanA) = shortPlain()
      in += Span(Kind.Html, rawA, "", off); off += 1
      golden += cleanA // content by the prev.words > 4 branch
      addContent()
      addBoiler() //                           case B: boiler-flanked short
      val (rawB, _) = shortPlain()
      in += Span(Kind.Html, rawB, "", off); off += 1 // NOT in golden
      addBoiler()
    }
    (in.result(), golden.result())
  }

  /** Adversarial PDF: every geometry rule exercised AT its boundary —
    *  - same-line merge at exactly LineTolY (3) and line split at 7;
    *  - block continuation at exactly BlockGapY (30) and split at 31;
    *  - column membership at x = 499 (column 0) vs x = 500 (column 1);
    *  - column 1's y range STARTS ABOVE column 0's (interleaved ranges):
    *    global-y ordering would interleave the columns; reading order must
    *    stay (column, then y);
    *  - malformed runs (non-numeric coords / too few fields) are dropped.
    * Goldens spell out the resulting reading order explicitly. */
  private def adversarialPdfDoc(rng: Random): (Seq[Span], Seq[String]) = {
    def w() = words(rng, 1).head
    val (w1, w2, w3, w4, w5, w6, w7, w8) = (w(), w(), w(), w(), w(), w(), w(), w())
    val (v1, v2, v3, v4)                 = (w(), w(), w(), w())
    val y0 = 20 + rng.nextInt(5)
    val runs = Seq(
      // column 0, block 1, line 1: y spread exactly LineTolY; x=499 edge
      s"10 $y0 $w1", s"60 ${y0 + 3} $w2", s"499 ${y0 + 1} $w3",
      // line 2 (Δy 7 > LineTolY from line 1's anchor)
      s"10 ${y0 + 7} $w4", s"200 ${y0 + 7} $w5",
      // line 3 at gap EXACTLY BlockGapY from line 2 → same block
      s"10 ${y0 + 37} $w6",
      // block 2 at gap BlockGapY + 1 → new block
      s"10 ${y0 + 68} $w7", s"80 ${y0 + 68} $w8",
      // column 1 (x = 500 edge) starts ABOVE column 0's range
      s"500 ${y0 - 5} $v1", s"560 ${y0 - 5} $v2",
      s"510 ${y0 + 2} $v3", // second line, same block (gap 7)
      s"500 ${y0 + 42} $v4", // new block (gap 40)
      // malformed: dropped by parseRun, never in golden
      "garbage", s"12 xx ${w()}")
    val shuffled = rng.shuffle(runs).zipWithIndex.map { case (r, i) =>
      Span(Kind.PdfGlyphs, r, "", i)
    }
    val golden = Seq(
      s"$w1 $w2 $w3 $w4 $w5 $w6", s"$w7 $w8", // column 0 blocks
      s"$v1 $v2 $v3", s"$v4") //                 column 1 blocks
    (shuffled, golden)
  }

  /** Media doc with ref_def edge semantics: the same name defined TWICE
    * (the ref map is built in offset order, so the LAST definition
    * shadows), a malformed def with no "->" (skipped), a media span whose
    * ref is already a URI (passes through — the idempotent-rerun
    * property), and a dangling ref (dropped). */
  private def shadowMediaDoc(rng: Random): (Seq[Span], Seq[Span]) = {
    val raw   = words(rng, 3 + rng.nextInt(8)).mkString("  ", " \n ", " ")
    val clean = raw.replaceAll("\\s+", " ").trim
    val in = Seq(
      Span(Kind.Text, raw, "", 0),
      Span(Kind.Image, "", "m0", 1), //          resolves to the SHADOWING def
      Span(Kind.Table, "", "m1", 2),
      Span(Kind.Image, "", "mem://media/pre0", 3), // already a URI: passes
      Span(Kind.Image, "", "m_dangling", 4), //  no def: dropped
      Span(Kind.RefDef, "m0 -> mem://media/old0", "", 5),
      Span(Kind.RefDef, "m0 -> mem://media/new0", "", 6), // shadows old0
      Span(Kind.RefDef, "malformed def without arrow", "", 7), // skipped
      Span(Kind.RefDef, "m1 -> mem://media/t1", "", 8))
    val golden = Seq(
      Span(Kind.Text, clean, "", 0),
      Span(Kind.Image, "", "mem://media/new0", 0),
      Span(Kind.Table, "", "mem://media/t1", 0),
      Span(Kind.Image, "", "mem://media/pre0", 0))
    (in, golden)
  }

  /** Generate one (input, golden) pair. Pure in (docIdx, seed). */
  def pair(docIdx: Long, seed: Long): (Document, Document) = {
    val rng = new Random(mix(seed, docIdx))
    val id  = f"doc_$docIdx%012d"
    // adversarial slots first (each replaces a same-family %20 slot, so
    // the corpus mix stays comparable): 21→mega, 31→pdf, 43→html, 55→media
    val (inSpans, goldenSpans): (Seq[Span], Seq[Span]) = (docIdx % 100) match {
      case 21 => // >1 MB mega doc: the skew case salted repartitioning is for
        val (in, g) = htmlDoc(rng, 4000)
        (in, g.map(t => Span(Kind.Text, t, "", 0)))
      case 31 => // threshold-boundary multi-column pdf
        val (in, g) = adversarialPdfDoc(rng)
        (in, g.map(t => Span(Kind.Text, t, "", 0)))
      case 43 => // flanking-boilerplate html
        val (in, g) = adversarialHtmlDoc(rng)
        (in, g.map(t => Span(Kind.Text, t, "", 0)))
      case 55 => // ref_def shadowing media
        shadowMediaDoc(rng)
      case 67 => // multilingual UTF-8 html (corpus v4): CJK/Cyrillic/
        // accented/emoji content through the same boilerplate rules —
        // goldens by construction, so 100% golden equality PROVES the
        // kernel is script-agnostic
        val (in, g) = htmlDoc(rng, 4 + rng.nextInt(10), Utf8Vocab)
        (in, g.map(t => Span(Kind.Text, t, "", 0)))
      case _ => (docIdx % 20) match {
        case 0 => // empty doc
          (Nil, Nil)
        case 1 | 2 => // mega doc (skew case): ~50x a normal html doc
          val (in, g) = htmlDoc(rng, 400)
          (in, g.map(t => Span(Kind.Text, t, "", 0)))
        case m if m <= 9 => // html doc
          val (in, g) = htmlDoc(rng, 4 + rng.nextInt(10))
          (in, g.map(t => Span(Kind.Text, t, "", 0)))
        case m if m <= 14 => // pdf doc
          val (in, g) = pdfDoc(rng)
          (in, g.map(t => Span(Kind.Text, t, "", 0)))
        case _ => // media-interleaved
          mediaDoc(rng)
      }
    }
    val golden = goldenSpans.zipWithIndex.map { case (s, i) => s.copy(offset = i) }
    (Document(id, inSpans), Document(id, golden))
  }

  def input(docIdx: Long, seed: Long): Document  = pair(docIdx, seed)._1
  def golden(docIdx: Long, seed: Long): Document = pair(docIdx, seed)._2

  /** Local (non-Spark) batch for unit tests. */
  def pairs(n: Int, seed: Long): Seq[(Document, Document)] =
    (0L until n.toLong).map(pair(_, seed))
}
