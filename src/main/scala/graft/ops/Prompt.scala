package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prompt generation (`CC/loaders/utils/tag_convert.py`, driven per
  * sentence by `CC/loaders/lex_loader.py:152-199`): each entity (or
  * dictionary-matched word) becomes a masked cloze prompt
  * "<word>是一个[MASK]…," with aligned mask/tag streams. SURVEY §2.2
  * originally scoped these out as pretraining-only; they are in fact pure
  * data transforms, so they live here as first-class operators.
  */
object Prompt {

  val Mask = "[MASK]"
  val DefaultTag = "O"
  private val Stem = "是一个".map(_.toString) // 3 chars (tag_convert.py:51)

  final case class PromptRow(prompt: Seq[String], mask: Seq[Int],
                             tags: Seq[String], origin: Seq[String])

  /** `word2prompt` (tag_convert.py:10-21): word + "是一个单词," — no mask
    * slots, all-default tags, origin == prompt.
    */
  def wordPrompt(word: String): PromptRow = {
    val chars = word.map(_.toString) ++ "是一个单词,".map(_.toString)
    PromptRow(chars, Seq.fill(chars.length)(1),
      Seq.fill(chars.length)(DefaultTag), chars)
  }

  /** `tag2prompt` (tag_convert.py:23-61): word + "是一个" + [MASK]×|rule| +
    * ","; origin carries the rule text instead of masks; mask = 1s except
    * the rule slots; tags = the word's BMES tags padded with default.
    * Unknown tag type → None (the "skip" branch, `:47-50`); length
    * mismatch → IllegalArgumentException (the ValueError, `:39-40`).
    */
  def tagPrompt(tags: Seq[String], word: String,
                rules: Map[String, String]): Option[PromptRow] = {
    require(word.length == tags.length,
      "the length of word is not equal to the tag")
    // split('-').last is the REFERENCE's `tag[0].split('-')[-1]`
    // (tag_convert.py:46) kept verbatim — note it takes the LAST dash
    // segment, unlike core.Tags.typeOf (first dash), so a hyphenated type
    // like "GPE-CITY" keys the rules map as "CITY" here. Reference labels
    // contain no inner dashes, so the paths agree on all reference data.
    val single = tags.head.split('-').last
    rules.get(single).map { rule =>
      val w = word.map(_.toString)
      val ruleChars = rule.map(_.toString)
      val origin = (w ++ Stem ++ ruleChars) :+ ","
      val prompt = (w ++ Stem ++ Seq.fill(ruleChars.length)(Mask)) :+ ","
      val mask = (Seq.fill(w.length)(1) ++ Seq.fill(Stem.length)(1) ++
        Seq.fill(ruleChars.length)(0)) :+ 1
      val ptags = tags ++ Seq.fill(prompt.length - w.length)(DefaultTag)
      PromptRow(prompt, mask, ptags, origin)
    }
  }

  /** BMES tag sequence for a (label, length) — the `get_labels(label, len)`
    * the per-sentence scan feeds into tag2prompt (lex_loader.py:162-163).
    */
  def bmesTags(label: String, len: Int): Seq[String] =
    if (len == 1) Seq(s"S-$label")
    else s"B-$label" +: Seq.fill(len - 2)(s"I-$label") :+ s"E-$label"

  /** Per-entity prompt generation over a mention table
    * (lex_loader.py:156-171): single-char surfaces are skipped, prompts
    * dedup per (conv_id, turn_idx) on the origin string (the reference's
    * per-sentence `exist_entity` set). CSV-encoded streams keep the output
    * hashable across engines.
    */
  def entityPrompts(mentions: DataFrame, rules: Map[String, String]): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    mentions.select(col("conv_id"), col("turn_idx"), col("label"), col("surface"))
      .as[(String, Int, String, String)]
      .flatMap { case (c, t, l, s) =>
        if (s.length <= 1) None // skip S- (lex_loader.py:160-161)
        else tagPrompt(bmesTags(l, s.length), s, rules).map { p =>
          (c, t, p.origin.mkString, p.prompt.mkString,
            p.mask.mkString(","), p.tags.mkString(","))
        }
      }
      .toDF("conv_id", "turn_idx", "prompt_origin", "prompt", "mask_csv", "tags_csv")
      // deterministic winner per origin: dropDuplicates keeps a partition-
      // order-dependent row when a NON-injective rules map lets two labels
      // share one origin with different tag streams
      .groupBy(col("conv_id"), col("turn_idx"), col("prompt_origin"))
      .agg(min(struct(col("prompt"), col("mask_csv"), col("tags_csv"))).as("_w"))
      .select(col("conv_id"), col("turn_idx"), col("prompt_origin"),
        col("_w.prompt").as("prompt"), col("_w.mask_csv").as("mask_csv"),
        col("_w.tags_csv").as("tags_csv"))
  }

  /** Per-sentence matched-word half (lex_loader.py:179-199): prompts for
    * dictionary-matched words from their tagged-vocab tags — skip
    * single-char words and words whose head tag is the default ("O").
    * Input: DataFrame(word, tags array<string>) — e.g. selfLabelVocab's
    * output or the tagged-vocab source.
    */
  def matchedWordPrompts(taggedWords: DataFrame,
                         rules: Map[String, String]): DataFrame = {
    val spark = taggedWords.sparkSession
    import spark.implicits._
    taggedWords.select(col("word"), col("tags"))
      .as[(String, Seq[String])]
      .flatMap { case (w, tags) =>
        if (w.length <= 1 || tags.isEmpty || tags.head == DefaultTag) None
        else tagPrompt(tags, w, rules).map { p =>
          (w, p.origin.mkString, p.prompt.mkString,
            p.mask.mkString(","), p.tags.mkString(","))
        }
      }
      .toDF("word", "prompt_origin", "prompt", "mask_csv", "tags_csv")
      // deterministic winner, as in entityPrompts
      .groupBy(col("prompt_origin"))
      .agg(min(struct(col("word"), col("prompt"), col("mask_csv"),
        col("tags_csv"))).as("_w"))
      .select(col("_w.word").as("word"), col("prompt_origin"),
        col("_w.prompt").as("prompt"), col("_w.mask_csv").as("mask_csv"),
        col("_w.tags_csv").as("tags_csv"))
  }
}
