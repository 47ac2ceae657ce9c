package graft.extract

/** HTML boilerplate stripping via shallow text features.
  *
  * Re-derivation (from the published algorithm description, not from any
  * code) of the densitometric classifier in Kohlschütter, Fankhauser,
  * Nejdl — "Boilerplate Detection using Shallow Text Features", WSDM 2010
  * (the "NumWordsRules" decision-tree): a block is classified by its own
  * link density and the word counts of (prev, curr, next).
  *
  * Reference analog: the LLM prompt asks the model to separate bill
  * content from page furniture (/root/reference/app.py:157-203); the
  * rebuild replaces that with this deterministic rule
  * (BASELINE.json north_rule: "HTML boilerplate strip ...
  * text-density/link-density DOM heuristics").
  *
  * Pure function, no Spark types — unit-testable standalone, invoked from
  * `mapPartitions` (SURVEY.md §7.1).
  */
object Boilerplate {

  /** Shallow features of one HTML-ish block. */
  final case class Block(text: String, words: Int, linkWords: Int) {
    def linkDensity: Double = if (words == 0) 0.0 else linkWords.toDouble / words
  }

  private val TagRe    = "<[^>]*>".r
  private val AnchorRe = "(?s)<a\\b[^>]*>(.*?)</a>".r

  private def wordCount(s: String): Int = {
    val t = s.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }

  /** Parse one raw HTML-ish block into its shallow features.
    * Anchor text counts toward both `words` and `linkWords`; markup is
    * dropped; entities are not interpreted (synthetic corpus has none). */
  def parse(raw: String): Block = {
    val linkWords = AnchorRe.findAllMatchIn(raw).map(m => wordCount(TagRe.replaceAllIn(m.group(1), " "))).sum
    val stripped  = TagRe.replaceAllIn(raw, " ")
    Block(collapseWs(stripped), wordCount(stripped), linkWords)
  }

  /** Collapse whitespace runs to single spaces and trim — the rebuild's
    * output-side analog of the reference's newline cleanup + whitespace
    * normalization (/root/reference/field_extractor_gemini.py:26-33,
    * /root/reference/eval_script_field_level.py:127-132). */
  def collapseWs(s: String): String = s.replaceAll("\\s+", " ").trim

  /** WSDM-2010 NumWordsRules classifier (re-derived thresholds from the
    * paper's published decision tree). Returns true iff `curr` is main
    * content given its neighbors. */
  def isContent(prev: Block, curr: Block, next: Block): Boolean = {
    if (curr.linkDensity > 0.333333) false
    else if (prev.linkDensity <= 0.555555)
      curr.words > 16 || next.words > 15 || prev.words > 4
    else
      curr.words > 40 || next.words > 17
  }

  private val EmptyBlock = Block("", 0, 0)

  /** Strip boilerplate from an ordered sequence of raw HTML-ish blocks:
    * returns the cleaned text of content blocks, in document order. */
  def extract(rawBlocks: Seq[String]): Seq[String] = {
    if (rawBlocks.isEmpty) return Nil
    val blocks = rawBlocks.map(parse)
    val n      = blocks.length
    val out    = Seq.newBuilder[String]
    var i      = 0
    while (i < n) {
      val prev = if (i == 0) EmptyBlock else blocks(i - 1)
      val next = if (i == n - 1) EmptyBlock else blocks(i + 1)
      val curr = blocks(i)
      if (curr.words > 0 && isContent(prev, curr, next)) out += curr.text
      i += 1
    }
    out.result()
  }
}
