package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines
  * (SURVEY.md §2.10): language ID, quality scoring, token counting,
  * document fingerprinting. All pure codegen-friendly column
  * expressions over `documents` — embarrassingly parallel, no shuffle
  * except final sorts, so they scale linearly with input splits.
  */
object TextAnalysis {

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  private def markerCount(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(c, lit(words.mkString("\\b(", "|", ")\\b")),
      lit(0)))

  /** Language ID via marker n-gram profile scores + deterministic
    * argmax. (The classic stopword-profile heuristic; marker sets are
    * fixed per "language" so the classifier is a pure function of the
    * text.)
    */
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        markerCount(col("text"), Seq("the", "a", "of")).as("s_en"),
        markerCount(col("text"), Seq("data", "query", "row")).as("s_zh"),
        markerCount(col("text"), Seq("fast", "slow", "small")).as("s_de"))
      .withColumn("predicted_lang",
        when(col("s_en") >= col("s_zh") && col("s_en") >= col("s_de"), "en")
          .when(col("s_zh") >= col("s_de"), "zh")
          .otherwise("de"))
      .orderBy("doc_id")

  /** Quality scoring: length/word-count/diversity/word-length ratios
    * blended into one bounded score (the length-punct-stopword family).
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        size(tokens(col("text"))).as("n_words"),
        size(array_distinct(tokens(col("text")))).as("n_distinct_words"))
      .withColumn("distinct_ratio", col("n_distinct_words") / col("n_words"))
      .withColumn("quality_score",
        round(lit(0.5) * col("distinct_ratio") +
          lit(0.5) * least(col("n_words") / lit(100.0), lit(1.0)), 4))
      .orderBy("doc_id")

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single other chars).
    */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(tokens(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"),
        round(length(col("text")) / size(tokens(col("text"))), 2)
          .as("chars_per_token"))
      .orderBy("doc_id")

  /** Document fingerprinting: md5 of whitespace-normalized text, plus
    * the exact-duplicate group size per fingerprint.
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.fanOut(Tables.documents(s, dir))
      .select(col("doc_id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
          .as("fingerprint"))
    val groups = fp.groupBy("fingerprint").agg(count(lit(1)).as("n_same"))
    fp.join(groups, "fingerprint")
      .select(col("doc_id"), col("fingerprint"), col("n_same"))
      .orderBy("doc_id")
  }
}
