package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.core.Tags

/** Reference-format interop (SURVEY.md §2.1): every file format the
  * reference reads or writes, as Spark readers/writers with explicit
  * schemas (never inferSchema — schema drift is an analysis-time error,
  * matching the reference's hard failures at `cn_loader.py:91-102`).
  */
object Formats {

  /** One reference-format sentence: char-tokenized text + per-char tags
    * (`{"text": ["坐","落"], "label": ["O","O"]}`, one JSON object per
    * line — `CC/loaders/utils/cn_data_manager.py:174-194`).
    */
  final case class SentenceRecord(text: Seq[String], label: Seq[String])

  val sentenceSchema: StructType = StructType(Seq(
    StructField("text", ArrayType(StringType), nullable = false),
    StructField("label", ArrayType(StringType), nullable = true)))

  /** JSONL sentence source (ReadJsonData). Strict mode enforces the
    * reference's invariants (len(text)==len(label), cn_loader.py:91-102) by
    * failing the job; lenient mode routes violations to a counted side
    * channel instead (the at-scale choice).
    */
  def readSentencesJsonl(spark: SparkSession, path: String,
                         strict: Boolean = false): DataFrame = {
    // explicit corrupt-record column: without it a malformed JSON line
    // parses to an all-null row that `label IS NULL` would wave through as
    // "valid prediction row"; and text.isNotNull first so the length
    // comparison can never go three-valued-null past the filter
    val df = spark.read.schema(sentenceSchema.add("_corrupt", StringType))
      .option("columnNameOfCorruptRecord", "_corrupt").json(path)
    val checked = df.withColumn("_valid",
      coalesce(col("_corrupt").isNull && col("text").isNotNull &&
        (col("label").isNull || size(col("text")) === size(col("label"))),
        lit(false)))
      .drop("_corrupt")
    if (strict) {
      checked.filter(!col("_valid")).limit(1).collect().foreach { _ =>
        throw new IllegalArgumentException(
          "invalid sentence row (malformed JSON, null text, or len(text) != len(label)) in " + path)
      }
      checked.drop("_valid")
    } else checked
  }

  /** JSONL predictions sink (`weibo.py:57-64` shape). */
  def writeSentencesJsonl(df: DataFrame, path: String): Unit =
    df.select(col("text"), col("label")).write.mode("overwrite").json(path)

  /** CoNLL source: `word<sep>tag` lines, sentences split on blank lines
    * (`cn_data_manager.py:117-141`). Distributed segmentation: sentence id =
    * running count of blank lines before each row (`sum(blank) over
    * (order by line)`) — one global-ordered window over the file's line
    * numbers; per-file monotonic ids come free from `zipWithIndex`-style
    * `monotonically_increasing_id` only if the file is one partition, so we
    * use the text reader's preserved order via a single file partition per
    * file (CoNLL files are small dimension inputs, not fact tables).
    */
  def readConll(spark: SparkSession, path: String, sep: String = " "): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).coalesce(1)
      .rdd.zipWithIndex().toDF("line", "line_no")
    val w = Window.orderBy(col("line_no"))
    lines
      .withColumn("blank", when(length(trim(col("line"))) === 0, 1L).otherwise(0L))
      .withColumn("sentence_id",
        sum(col("blank")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("blank") === 0)
      .withColumn("word", split(col("line"), java.util.regex.Pattern.quote(sep)).getItem(0))
      .withColumn("tag", split(col("line"), java.util.regex.Pattern.quote(sep)).getItem(1))
      .select(col("sentence_id"), col("line_no"), col("word"), col("tag"))
  }

  /** CoNLL "extreme" variant: drop rows matching `pattern` before
    * segmentation (`cn_data_manager.py:146-172`, default `'， O'`).
    */
  def readConllExtreme(spark: SparkSession, path: String, sep: String = " ",
                       dropPattern: String = "， O"): DataFrame =
    readConll(spark, path, sep)
      .filter(!concat_ws(sep, col("word"), col("tag")).contains(dropPattern))

  /** Tag-list source: labels.txt, one tag per line, order-preserving
    * (`cn_data_manager.py:212-218`). Tiny dim → driver list.
    */
  def readTagList(path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .asScala.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Embedding text source: header `count dim`, then `word v1..vd`;
    * tolerant of over-length lines (`CC/loaders/utils/embedding.py:29-31`:
    * takes the LAST `dim` values as the vector and joins everything before
    * them as the word — so a word containing spaces still parses).
    * `dim` comes from the explicit parameter when given (> 0); otherwise
    * from the header, or inferred from the first data line. Rows whose
    * vector is not exactly `dim` floats are dropped (corrupt/short lines).
    *
    * Inference caveat (pass `dim` explicitly to avoid it): the probe reads
    * ONE line — with a multi-file glob, or a headerless file whose first
    * word contains spaces, the inferred dim can be wrong and valid rows are
    * then silently dropped by the size filters below.
    */
  def readEmbeddingTxt(spark: SparkSession, path: String,
                       maxScan: Int = -1, dim0: Int = -1): DataFrame = {
    val raw0 = spark.read.textFile(path)
    val raw = if (maxScan > 0) raw0.limit(maxScan + 1) else raw0
    // header probe: tiny dimension input, one driver-side single-row
    // collect is fine (empty-file safe, unlike first())
    val firstLine = raw.limit(1).collect().headOption
    val firstToks = firstLine.map(_.trim.split("\\s+")).getOrElse(Array.empty[String])
    val headerLooking = firstToks.length == 2 && firstToks.forall(_.matches("\\d+"))
    val dim =
      if (dim0 > 0) dim0
      else if (firstLine.isEmpty) 0
      else if (headerLooking) firstToks(1).toInt
      else firstToks.length - 1
    if (dim <= 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("word", StringType),
          StructField("embedding", ArrayType(FloatType)))))
    // drop ONLY the header (exact first-line match when one exists) — the
    // old any-two-integers regex also dropped every DATA line shaped like
    // two ints (e.g. word "2016" with a dim-1 vector "7")
    val noHeader0 = raw.filter(length(trim(col("value"))) > 0)
    val noHeader = if (headerLooking)
      noHeader0.filter(col("value") =!= lit(firstLine.get)) else noHeader0
    noHeader
      .withColumn("parts", split(trim(col("value")), "\\s+"))
      .filter(size(col("parts")) >= dim + 1)
      .select(
        // word = all tokens before the trailing dim values, re-joined
        concat_ws(" ", expr(s"slice(parts, 1, size(parts) - $dim)")).as("word"),
        // try_cast, not cast: under ANSI mode a malformed float token would
        // otherwise throw and kill the job — here it nulls the element and
        // the exists(isNull) filter below drops the corrupt ROW instead
        // (pinned by the q47 fixture oracle)
        expr(s"transform(slice(parts, -$dim, $dim), x -> try_cast(x as float))")
          .as("embedding"))
      .filter(!exists(col("embedding"), e => e.isNull) &&
        size(col("embedding")) === dim)
  }

  /** Vocab source: first whitespace token per line, `limit(maxScan)` pushed
    * down (`vocab.py:36-63`).
    */
  def readVocabTxt(spark: SparkSession, path: String, maxScan: Int = -1): DataFrame = {
    val raw0 = spark.read.textFile(path)
    val raw = if (maxScan > 0) raw0.limit(maxScan) else raw0
    raw.filter(length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").getItem(0).as("word"))
  }

  /** Tagged-vocab source: JSONL `[word_or_chars, tags]` pairs
    * (`vocab_tag.py:58-71`; word may be a char list that joins to the token).
    */
  def readTaggedVocabJsonl(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("w", StringType), StructField("t", ArrayType(StringType))))
    spark.read.text(path)
      .select(from_json(col("value"), ArrayType(StringType)).as("arr"),
        get_json_object(col("value"), "$[0]").as("word_raw"),
        from_json(get_json_object(col("value"), "$[1]"), ArrayType(StringType)).as("tags"))
      .select(
        // word may itself be a JSON char array → join it (vocab_tag.py:51-52);
        // concat_ws on a NULL array yields "" (never null), so branch on the
        // parse result instead of coalescing
        when(from_json(col("word_raw"), ArrayType(StringType)).isNotNull,
          concat_ws("", from_json(col("word_raw"), ArrayType(StringType))))
          .otherwise(col("word_raw")).as("word"),
        col("tags"))
      .filter(col("word").isNotNull && col("tags").isNotNull)
  }

  /** Span-JSON → per-char BIO/BMES rows (CNERTA/CLUENER converter shape,
    * `tools/to_json.py:53-121`): input rows (doc_id, text, spans:
    * array<struct<start,end,label>>) → (doc_id, pos, ch, tag) with BMES
    * scatter. Pure columns: posexplode over the char array + span lookup.
    */
  def spansToCharTags(df: DataFrame): DataFrame = {
    val chars = df.select(col("doc_id"), col("spans"),
      posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
    chars.withColumn("tag",
      // the span covering this position, if any (spans are non-overlapping);
      // get() is 0-based and null-safe (ANSI element_at throws on empty)
      get(filter(col("spans"),
        s => col("pos") >= s.getField("start") && col("pos") < s.getField("end")), lit(0))
    ).select(col("doc_id"), col("pos"), col("ch"),
      when(col("tag").isNull, "O")
        .when(col("tag.end") - col("tag.start") === 1, concat(lit("S-"), col("tag.label")))
        .when(col("pos") === col("tag.start"), concat(lit("B-"), col("tag.label")))
        .when(col("pos") === col("tag.end") - 1, concat(lit("E-"), col("tag.label")))
        .otherwise(concat(lit("I-"), col("tag.label"))).as("tag"))
  }

  /** Dataset merge (`tools/merge_json.py:4-14`): concat with schema check. */
  def mergeDatasets(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_))

  /** Label-file merge preserving first-seen order (`merge_json.py:17-33`):
    * dedup + order index from the earliest source position.
    */
  def mergeLabelLists(spark: SparkSession, lists: Seq[Seq[String]]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    lists.foreach(_.foreach(seen.add))
    seen.toSeq
  }
}
