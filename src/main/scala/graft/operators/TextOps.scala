package graft.operators

import graft.functions.TextKernels._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus: token counting,
  * quality scoring, language-ID (marker n-gram heuristic), and document
  * fingerprinting. All per-document (narrow, no shuffle until an optional
  * aggregate) — the shape that scans 100 TB at I/O speed. Built-ins only,
  * with exact DuckDB oracles.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** BPE-ish pre-token pattern: letter runs | digit runs | single other
    * non-space char (a common pre-tokenizer shape; Java and RE2 agree). */
  private val BpePat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  private val Stopwords = Seq("the", "a", "and", "of", "is", "to", "in")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens + BPE-ish regex pre-tokens.
    "text_tokens" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit(BpePat), lit(0))).cast("long").as("bpe_tokens"),
        length(col("text")).cast("long").as("chars"))),

    // Quality scoring: length/punctuation/stopword signals → one score.
    "text_quality" -> ((s, dir) => {
      val toks  = tokens(col("text"))
      val nTok  = size(toks).cast("long")
      val sumLn = aggregate(transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
      val nStop = markerHits(toks, Stopwords).cast("long")
      val nPunc = length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9\\s]", ""))
      docs(s, dir)
        .withColumn("n_tokens", nTok)
        .withColumn("avg_token_len", round(sumLn / nTok, 4))
        .withColumn("stopword_ratio", round(nStop / nTok, 4))
        .withColumn("punct_ratio", round(nPunc / length(col("text")), 4))
        .withColumn("quality",
          round(
            when(col("n_tokens").between(5, 10000), lit(1.0)).otherwise(lit(0.5))
              * (lit(1.0) - col("punct_ratio"))
              * when(col("avg_token_len").between(2.0, 12.0), lit(1.0)).otherwise(lit(0.8)), 4))
        .select("doc_id", "n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio", "quality")
    }),

    // Language-ID: marker-stopword hit counts per language, argmax with
    // alphabetical tie-break (a deterministic n-gram heuristic, not a model).
    "text_langid" -> ((s, dir) => {
      val toks   = tokens(col("text"))
      val scored = docs(s, dir).select(
        col("doc_id") +: LangMarkers.map { case (lang, ms) =>
          markerHits(toks, ms).cast("long").as(s"s_$lang")
        }: _*)
      val best = greatest(LangMarkers.map { case (lang, _) => col(s"s_$lang") }: _*)
      val pred = LangMarkers.foldRight(lit("und")) { case ((lang, _), acc) =>
        when(col(s"s_$lang") === best && best > 0, lit(lang)).otherwise(acc)
      }
      // foldRight keeps the FIRST (alphabetically smallest) max-scoring lang
      scored.withColumn("lang_pred", pred)
    }),

    // Fingerprinting: rolling polynomial hash + winnowing-style min 8-gram.
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        winnowMin(col("text")).as("winnow_min"))))

  // --- DuckDB oracles -----------------------------------------------------

  private def dkStop(toks: String) = Dk.markerHits(toks, Stopwords)

  val oracles: Map[String, String] = Map(
    "text_tokens" ->
      s"""SELECT doc_id,
         | len(${Dk.tokens("text")})::BIGINT AS ws_tokens,
         | len(regexp_extract_all(lower(text), '$BpePat'))::BIGINT AS bpe_tokens,
         | length(text)::BIGINT AS chars
         |FROM documents""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, ${Dk.tokens("text")} AS toks FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    len(toks)::BIGINT AS n_tokens,
         |    round(list_reduce(list_prepend(0::BIGINT, [length(x)::BIGINT for x in toks]), (a, b) -> a + b) / len(toks), 4) AS avg_token_len,
         |    round(${dkStop("toks")} / len(toks), 4) AS stopword_ratio,
         |    round((length(text) - length(regexp_replace(text, '[^a-z0-9\\s]', '', 'g'))) / length(text), 4) AS punct_ratio
         |  FROM t)
         |SELECT doc_id, n_tokens, avg_token_len, stopword_ratio, punct_ratio,
         |  round((CASE WHEN n_tokens BETWEEN 5 AND 10000 THEN 1.0 ELSE 0.5 END)::DOUBLE
         |        * (1.0 - punct_ratio)
         |        * (CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.8 END)::DOUBLE, 4) AS quality
         |FROM m""".stripMargin,
    "text_langid" -> {
      val scores = LangMarkers.map { case (lang, ms) => s"${Dk.markerHits("toks", ms)}::BIGINT AS s_$lang" }.mkString(", ")
      val best   = LangMarkers.map { case (lang, _) => s"s_$lang" }.mkString("greatest(", ", ", ")")
      val pred = LangMarkers.reverse.foldLeft("'und'") { case (acc, (lang, _)) =>
        s"CASE WHEN s_$lang = $best AND $best > 0 THEN '$lang' ELSE $acc END"
      }
      s"""WITH t AS (SELECT doc_id, ${Dk.tokens("text")} AS toks FROM documents),
         |s AS (SELECT doc_id, $scores FROM t)
         |SELECT doc_id, ${LangMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")}, $pred AS lang_pred
         |FROM s""".stripMargin
    },
    "text_fingerprint" ->
      s"""SELECT doc_id, ${Dk.fingerprint("text")} AS fp, ${Dk.winnowMin("text")} AS winnow_min
         |FROM documents""".stripMargin)
}
