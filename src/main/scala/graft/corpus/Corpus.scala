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

  private def mix(seed: Long, docIdx: Long): Long = {
    var z = seed + docIdx * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def words(rng: Random, n: Int, vocab: IndexedSeq[String] = Vocab): Seq[String] =
    Seq.fill(n)(vocab(rng.nextInt(vocab.length)))

  /** Unambiguous content block: >40 plain words, link density 0. */
  private def contentBlock(rng: Random): (String, String) = {
    val ws   = words(rng, 41 + rng.nextInt(40))
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
  private def htmlDoc(rng: Random, blocks: Int): (Seq[Span], Seq[String]) = {
    val in     = Seq.newBuilder[Span]
    val golden = Seq.newBuilder[String]
    var off    = 0
    (0 until blocks).foreach { _ =>
      if (rng.nextDouble() < 0.55) {
        in += Span(Kind.Html, boilerBlock(rng), "", off)
      } else {
        val (raw, clean) = contentBlock(rng)
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

  /** Generate one (input, golden) pair. Pure in (docIdx, seed). */
  def pair(docIdx: Long, seed: Long): (Document, Document) = {
    val rng = new Random(mix(seed, docIdx))
    val id  = f"doc_$docIdx%012d"
    val (inSpans, goldenSpans): (Seq[Span], Seq[Span]) = (docIdx % 20) match {
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
    val golden = goldenSpans.zipWithIndex.map { case (s, i) => s.copy(offset = i) }
    (Document(id, inSpans), Document(id, golden))
  }

  def input(docIdx: Long, seed: Long): Document  = pair(docIdx, seed)._1
  def golden(docIdx: Long, seed: Long): Document = pair(docIdx, seed)._2

  /** Local (non-Spark) batch for unit tests. */
  def pairs(n: Int, seed: Long): Seq[(Document, Document)] =
    (0L until n.toLong).map(pair(_, seed))
}
