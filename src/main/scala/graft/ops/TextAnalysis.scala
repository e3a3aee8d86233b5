package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, token statistics, and
  * document fingerprinting. All pure `Column` expressions (codegen'd,
  * shuffle-free per row) except the aggregations, which are single hash
  * aggs — linear at any corpus size.
  */
object TextAnalysis {

  /** Whitespace tokenization of lowercased text, empty tokens dropped.
    * Kept deliberately simple so the DuckDB oracle can mirror it exactly;
    * a BPE-ish regex variant is [[bpeTokens]].
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Rough BPE-style pre-tokenization: splits on word boundaries keeping
    * punctuation as tokens (the GPT-2 pre-tokenizer shape, minus byte-level
    * merges).
    */
  def bpeTokens(text: Column): Column =
    filter(
      split(lower(text), "(?=[^a-z0-9'])|(?<=[^a-z0-9'])"),
      t => t =!= "" && t =!= " ")

  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Per-document quality signals: length, token counts, mean token length,
    * stopword ratio, and a composite score in [0,1]. Heuristics follow the
    * usual pretraining-data filters (length + stopword-density).
    */
  def quality(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tk = tokens(col(textCol))
    val nTok = size(tk).cast("long")
    val stopHits = size(filter(tk, t => t.isin(Stopwords: _*))).cast("long")
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      nTok.as("n_tokens"),
      round(
        aggregate(tk, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          greatest(nTok, lit(1L)),
        4).as("avg_token_len"),
      round(stopHits.cast("double") / greatest(nTok, lit(1L)), 4).as("stopword_ratio"),
      round(
        least(nTok.cast("double") / 100.0, lit(1.0)) *
          (lit(1.0) - stopHits.cast("double") / greatest(nTok, lit(1L))),
        4).as("quality_score"))
  }

  /** Marker-token sets per language for the n-gram/stopword language-ID
    * heuristic. Ties resolve in declaration order (en, de, es, fr).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "es" -> Seq("el", "la", "los", "es"),
    "fr" -> Seq("le", "les", "des", "est"))

  /** Language ID by marker-token counting: score per language = number of
    * tokens in that language's marker set; prediction = argmax with
    * declaration-order tie-break.
    */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tk = tokens(col(textCol))
    val scored = docs.select(
      col(idCol) +: LangMarkers.map { case (lang, markers) =>
        size(filter(tk, t => t.isin(markers: _*))).cast("long").as(s"s_$lang")
      }: _*)
    // argmax as an explicit CASE chain (declaration order wins ties) so the
    // DuckDB oracle can be textually identical in structure
    val pred = LangMarkers.indices.foldRight(lit(LangMarkers.last._1)) { (i, acc) =>
      val (lang, _) = LangMarkers(i)
      val isMax = LangMarkers
        .drop(i + 1)
        .map { case (other, _) => col(s"s_$lang") >= col(s"s_$other") }
        .foldLeft(lit(true))(_ && _)
      when(isMax, lit(lang)).otherwise(acc)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** Token statistics + rolling document fingerprint: md5 of the
    * whitespace-normalized lowercased text — the exact-dedup key.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tk = tokens(col(textCol))
    docs.select(
      col(idCol),
      size(tk).cast("long").as("n_tokens"),
      size(array_distinct(tk)).cast("long").as("n_distinct"),
      fingerprint(col(textCol)).as("fingerprint"))
  }

  /** Normalized-text fingerprint (C9-adjacent; the dedup-exact key). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))
}
