package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over a `documents`
  * table (doc_id, text, lang, source, n_chars). Everything here is built
  * from codegen'd `org.apache.spark.sql.functions` — no UDFs — so filters
  * and projections stay inside WholeStageCodegen and push down to the scan.
  */
object TextAnalysis {

  /** whitespace tokens; empty text → empty array (size 0, not [""]). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: words + digit runs + punctuation marks each
    * count as a token (a cheap deterministic stand-in for a real BPE; the
    * regex mirrors common pre-tokenizers).
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?<=\\W)|(?=\\W)"), t => length(trim(t)) > 0))

  // --- language-ID (n-gram/stopword heuristic) ----------------------------
  /** per-language stopword hit counts; langs chosen to match the fixture's
    * lang domain {en, de, es, fr, zh}.
    */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "est", "un"))

  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => words.map(w => t === lit(w)).reduce(_ || _)))
  }

  /** Heuristic language id: CJK char share ⇒ zh, else argmax stopword hits
    * with ties resolved to the ALPHABETICALLY-FIRST tied language (the fold
    * below visits languages in sorted order and keeps the first argmax);
    * 'und' (undetermined) only when no stopword hits at all. The q13 DuckDB
    * oracle pins exactly these semantics. Pure column expression.
    */
  def langId(text: Column): Column = {
    val cjk = size(split(text, "[\\x{4e00}-\\x{9fff}]")) - 1
    val hits = stopwords.toSeq.sortBy(_._1).map { case (l, ws) => (l, stopwordHits(text, ws)) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // seed the fold with the FIRST candidate (not lit("und")): a "und" seed
    // makes iteration 1 build the trivially-true `'und' == 'und'` predicate
    // Catalyst warns about on every run — same argmax-with-first-tie result
    val (l0, h0) = hits.head
    val seed = when(h0 === best && h0 > 0, lit(l0)).otherwise(lit("und"))
    val pick = hits.tail.foldLeft(seed) { case (acc, (l, h)) =>
      when(h === best && h > 0 && acc === lit("und"), lit(l)).otherwise(acc)
    }
    when(cjk > 0, lit("zh")).otherwise(pick)
  }

  // --- quality scoring -----------------------------------------------------
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
      greatest(length(text), lit(1)).cast("double")

  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))) /
      greatest(length(text), lit(1)).cast("double")

  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    (aggregate(toks, lit(0L), (acc, t) => acc + length(t)) /
      greatest(size(toks), lit(1))).cast("double")
  }

  def stopwordRatio(text: Column): Column = {
    val en = stopwords("en")
    stopwordHits(text, en) / greatest(tokenCount(text), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]-ish: rewards mid-length docs with low
    * punctuation noise and a sane stopword share (C4/Gopher-style filters,
    * deterministic).
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / lit(50.0), lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5)
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl.between(2.0, 12.0), 1.0).otherwise(0.3)
    round(lenScore * 0.4 + punctPenalty * 0.3 + mtlScore * 0.3, 4)
  }

  /** Normalized-content fingerprint: md5 of lowercased, whitespace-collapsed
    * text — exact-dedup key, stable across engines.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Engine-portable 60-bit hash: the first 15 hex chars of md5, parsed as
    * an integer. md5 is identical across Spark and DuckDB (unlike xxhash64,
    * which is Spark-only), so every sketch built on this hash is
    * cross-engine oracle-checkable. 15 hex digits = 60 bits, which fits a
    * signed 64-bit long with room to spare (no unsigned-overflow parsing
    * hazards in either engine).
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Rolling (Karp–Rabin-style) document fingerprint over token 4-grams:
    * per-window hash = hash60(concat of 4 consecutive tokens); document
    * fingerprint = min over windows (a 1-perm winnowing sketch).
    * Cross-engine checkable via the md5-derived hash.
    */
  def rollingMinHash(text: Column, k: Int = 4): Column = {
    val toks = tokens(lower(text))
    val idx = sequence(lit(0), greatest(size(toks) - k, lit(0)))
    array_min(transform(idx, i =>
      hash60(concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** Full per-document profile. */
  def profile(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      bpeishTokenCount(col("text")).as("n_bpeish"),
      round(punctRatio(col("text")), 4).as("punct_ratio"),
      round(meanTokenLen(col("text")), 4).as("mean_tok_len"),
      round(stopwordRatio(col("text")), 4).as("stopword_ratio"),
      qualityScore(col("text")).as("quality"),
      langId(col("text")).as("lang_pred"),
      fingerprint(col("text")).as("fp"))
}
