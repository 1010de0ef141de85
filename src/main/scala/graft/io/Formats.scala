package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
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

  /** Order-preserving distributed line source: one record per line carrying
    * (source file, absolute byte offset, line). `TextInputFormat` record
    * keys ARE the line's byte offset in its file, and a `NewHadoopRDD`
    * partition is exactly one input split — so (file, offset) is a total
    * order over every file's lines that needs NO driver-side collection,
    * no single-partition coalesce, and no global window. The foundation for
    * `readConll`'s distributed sentence numbering and the per-file header
    * drop in `readEmbeddingTxt`.
    *
    * @param maxSplitBytes test hook: force small input splits so multi-split
    *        ordering is exercised on small fixtures (-1 = cluster default).
    */
  private[graft] def linesWithOffsets(spark: SparkSession, path: String,
      maxSplitBytes: Long = -1L): org.apache.spark.rdd.RDD[(String, Long, String)] = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    if (maxSplitBytes > 0)
      conf.setLong("mapreduce.input.fileinputformat.split.maxsize", maxSplitBytes)
    spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { case (split, it) =>
        val file = split.asInstanceOf[FileSplit].getPath.toString
        // Text/LongWritable instances are REUSED by the record reader —
        // materialize per record
        it.map { case (k, v) => (file, k.get(), v.toString) }
      }
  }

  /** CoNLL source: `word<sep>tag` lines, sentences split on blank lines
    * (`cn_data_manager.py:117-141`). Fully distributed two-pass segmentation
    * (the `withSplit` recipe): pass 1 aggregates per-split line/blank counts
    * (splits are totally ordered by (file, first byte offset)); the driver
    * folds them into per-split line-number and sentence-id bases (a few
    * rows per 128 MB of input — trivially driver-sized); pass 2 numbers
    * each split locally from its broadcast base. No `coalesce(1)`, no
    * global window — a CoNLL corpus of fact-table size segments in
    * parallel. The input is read twice (both passes distributed), exactly
    * like `RDD.zipWithIndex`'s count-then-map shape.
    *
    * Multi-file input: files are ordered by path; a file boundary always
    * starts a new sentence (sentence ids keep counting across files).
    * line_no/sentence_id are both 0-based (q44 oracle). "Blank" is
    * `String.trim.isEmpty` — tabs/CR/control chars count as blank, matching
    * the reference's Python `line.strip()` for ASCII whitespace (a
    * deliberate deviation from the round-3 SQL `trim`, which stripped
    * spaces only: a tab-only line is a sentence boundary here and in the
    * reference, but was a data row there).
    */
  def readConll(spark: SparkSession, path: String, sep: String = " ",
                maxSplitBytes: Long = -1L): DataFrame = {
    import spark.implicits._
    val lines = linesWithOffsets(spark, path, maxSplitBytes)
    // pass 1: per-split (file, firstOffset, nLines, nBlanks)
    val stats = lines.mapPartitionsWithIndex { case (pid, it) =>
      var file: String = null
      var first = 0L
      var n = 0L
      var blanks = 0L
      it.foreach { case (f, off, line) =>
        if (file == null) { file = f; first = off }
        n += 1
        if (line.trim.isEmpty) blanks += 1
      }
      if (file == null) Iterator.empty
      else Iterator.single((pid, file, first, n, blanks))
    }.collect()
    // driver fold in (file, offset) order: line_no base is the global
    // cumulative line count; sentence base is the file's base (previous
    // files' blanks + one boundary sentence each) plus blanks in the file's
    // earlier splits
    val ordered = stats.sortBy { case (_, f, off, _, _) => (f, off) }
    val baseMap = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    var lineBase = 0L
    var fileSentBase = 0L
    var blanksInFile = 0L
    var curFile: String = null
    ordered.foreach { case (pid, f, _, n, b) =>
      if (f != curFile) {
        if (curFile != null) fileSentBase += blanksInFile + 1
        curFile = f
        blanksInFile = 0L
      }
      baseMap(pid) = (lineBase, fileSentBase + blanksInFile)
      lineBase += n
      blanksInFile += b
    }
    val bases = spark.sparkContext.broadcast(baseMap.toMap)
    val quoted = java.util.regex.Pattern.quote(sep)
    // pass 2: local running count from the broadcast base
    lines.mapPartitionsWithIndex { case (pid, it) =>
      val (lb, sb) = bases.value.getOrElse(pid, (0L, 0L))
      var i = 0L
      var blanks = 0L
      it.flatMap { case (_, _, line) =>
        val lineNo = lb + i
        i += 1
        if (line.trim.isEmpty) { blanks += 1; None }
        else {
          val parts = line.split(quoted, -1)
          val tag = if (parts.length > 1) parts(1) else null
          Some((sb + blanks, lineNo, parts(0), tag))
        }
      }
    }.toDF("sentence_id", "line_no", "word", "tag")
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
    * Header handling is PER FILE and positional: each file's byte-offset-0
    * line is dropped iff it looks like a `count dim` header — a data row
    * that happens to equal another file's header string survives, and every
    * file in a multi-file glob gets its own header dropped. Dim inference
    * (when `dim0` is not given) probes the path-wise first file's first
    * line; pass `dim` explicitly when a glob mixes dimensions.
    */
  def readEmbeddingTxt(spark: SparkSession, path: String,
                       maxScan: Int = -1, dim0: Int = -1): DataFrame = {
    import spark.implicits._
    val lines = linesWithOffsets(spark, path)
    // per-file first lines: each split's iterator yields its first record
    // only (offset 0 ⇔ the file's first split) — reads ONE line per split
    val firstLines = lines.mapPartitions(it =>
        it.take(1).filter(_._2 == 0L).map(t => (t._1, t._3)))
      .collect().toMap
    def headerToks(l: String): Array[String] = l.trim.split("\\s+")
    def isHeader(l: String): Boolean = {
      val t = headerToks(l); t.length == 2 && t.forall(_.matches("\\d+"))
    }
    val probe = firstLines.toSeq.sortBy(_._1).headOption.map(_._2)
    val dim =
      if (dim0 > 0) dim0
      else probe match {
        case None => 0
        case Some(l) if isHeader(l) => headerToks(l)(1).toInt
        case Some(l) => headerToks(l).length - 1
      }
    if (dim <= 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("word", StringType),
          StructField("embedding", ArrayType(FloatType)))))
    val headerFiles = firstLines.collect { case (f, l) if isHeader(l) => f }.toSeq
    val all = lines.toDF("_file", "_off", "value")
    val noHeader0 = all.filter(length(trim(col("value"))) > 0)
    val noHeader1 = if (headerFiles.isEmpty) noHeader0
      else noHeader0.filter(
        !(col("_off") === 0 && col("_file").isin(headerFiles: _*)))
    // cap AFTER the header/blank drops: exactly maxScan candidate data
    // lines pass (headers no longer eat an inexact share of the budget);
    // which lines survive an under-cap scan remains partition-order
    // dependent (as it always was) — pass no cap for exact reads
    val noHeader = if (maxScan > 0) noHeader1.limit(maxScan) else noHeader1
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
    spark.read.text(path)
      .select(get_json_object(col("value"), "$[0]").as("word_raw"),
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
    * dedup + order index from the earliest source position. Pure driver-side
    * merge (label files are tiny) — no SparkSession involved.
    */
  def mergeLabelLists(lists: Seq[Seq[String]]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    lists.foreach(_.foreach(seen.add))
    seen.toSeq
  }
}
