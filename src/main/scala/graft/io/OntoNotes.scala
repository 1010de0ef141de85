package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** OntoNotes4 `.name` XML → char-level BMES sentences
  * (`tools/ontonotes4.py:18-120`), as a distributed reader.
  *
  * Reference semantics reproduced exactly, including the quirks:
  *  - all whitespace EXCEPT newlines is stripped (`re.sub("[^\S\n]",'')`,
  *    `:29`); newlines survive as sentence boundaries;
  *  - `ENAMEX` children with TYPE ∈ {GPE, LOC, ORG, PERSON} get
  *    B-/I-/E- char tags (S- when length 1, `:35-40`); other ENAMEX types
  *    and non-ENAMEX elements emit all-O (`:41-45`); element tails emit
  *    all-O (`:49-53`);
  *  - text BEFORE the first child element (root.text) is DROPPED — the
  *    reference iterates elements only (`for child in root:`, `:28`);
  *  - the char stream splits into sentences at '\n'; segments starting
  *    with "（完）" are dropped; EMPTY segments between consecutive
  *    newlines are kept (the reference appends them, `:85-100`);
  *  - eval/test files (`chtb_0001–0325`, `chtb_1001–1078`) alternate their
  *    sentences into eval (odd ordinal) / test (even) via ONE global
  *    counter (`:74-100`); everything else is train. The reference's
  *    counter follows its sequential scan order — here the ordinal is a
  *    window over (file, sentence_idx), i.e. lexicographic file order,
  *    which matches the reference when map.txt lists files in name order
  *    (documented determinism choice).
  */
object OntoNotes {

  val ExpectLabels: Set[String] = Set("GPE", "LOC", "ORG", "PERSON")

  /** strip whitespace except newlines, char-tokenize (`:29`). */
  private def clean(s: String): Vector[String] =
    if (s == null) Vector.empty
    else s.replaceAll("[^\\S\\n]", "").map(_.toString).toVector

  /** ElementTree `.text` semantics (the reference's `child.text`, `:29,49`):
    * the contiguous text before the element's FIRST child element — text
    * inside or after nested markup is EXCLUDED, unlike DOM
    * `getTextContent`, which concatenates every descendant (nested ENAMEX
    * annotations occur in OntoNotes and would otherwise shift the char
    * stream for the whole rest of the document). Comments/PIs are skipped
    * and the text around them merged, matching ET's default parser, which
    * drops them. (Deviation: where ET yields `text = None` and the
    * reference's `re.sub` would raise TypeError, this returns "" — a
    * graceful superset of the reference's crash.)
    */
  private def etText(el: org.w3c.dom.Element): String = {
    val kids = el.getChildNodes
    val sb = new StringBuilder
    var i = 0
    var done = false
    while (!done && i < kids.getLength) {
      val k = kids.item(i)
      k.getNodeType match {
        case org.w3c.dom.Node.TEXT_NODE | org.w3c.dom.Node.CDATA_SECTION_NODE =>
          sb.append(k.getNodeValue)
        case org.w3c.dom.Node.ELEMENT_NODE => done = true
        case _ => () // comment/PI: ET drops the node and merges its flanks
      }
      i += 1
    }
    sb.toString
  }

  /** One `.name` XML document → (chars, labels) stream (`:18-53`). */
  def parseNameXml(xml: String): (Vector[String], Vector[String]) = {
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    factory.setNamespaceAware(false)
    // corpus .name files carry no DOCTYPE; disallowing it outright closes
    // XXE (external-entity file reads / DTD fetches on executor hosts from
    // a hostile file landing in the corpus glob)
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    val doc = factory.newDocumentBuilder()
      .parse(new org.xml.sax.InputSource(new java.io.StringReader(xml)))
    val root = doc.getDocumentElement
    val text = Vector.newBuilder[String]
    val label = Vector.newBuilder[String]
    val nodes = root.getChildNodes
    var seenElement = false
    var i = 0
    while (i < nodes.getLength) {
      val n = nodes.item(i)
      n.getNodeType match {
        case org.w3c.dom.Node.ELEMENT_NODE =>
          seenElement = true
          val el = n.asInstanceOf[org.w3c.dom.Element]
          val inner = clean(etText(el)) // ET child.text, NOT getTextContent
          val tags =
            if (el.getTagName == "ENAMEX" && ExpectLabels(el.getAttribute("TYPE"))
                && inner.nonEmpty) {
              val t = el.getAttribute("TYPE")
              if (inner.length == 1) Vector(s"S-$t")
              else s"B-$t" +: Vector.fill(inner.length - 2)(s"I-$t") :+ s"E-$t"
            } else Vector.fill(inner.length)("O")
          text ++= inner; label ++= tags
        case org.w3c.dom.Node.TEXT_NODE | org.w3c.dom.Node.CDATA_SECTION_NODE =>
          // tails only: root.text before the first element is dropped (:28)
          if (seenElement) {
            val tail = clean(n.getNodeValue)
            text ++= tail; label ++= Vector.fill(tail.length)("O")
          }
        case _ => ()
      }
      i += 1
    }
    (text.result(), label.result())
  }

  /** Char stream → sentences at '\n', dropping "（完）"-prefixed segments,
    * KEEPING empty segments (`:85-100`).
    */
  def toSentences(chars: Vector[String], labels: Vector[String])
      : Seq[(Int, Seq[String], Seq[String])] = {
    val out = Seq.newBuilder[(Int, Seq[String], Seq[String])]
    var last = 0
    var idx = 0
    def emit(from: Int, until: Int): Unit = {
      // prefix test on the first three single-char elements — no
      // whole-sentence mkString in this distributed flatMap hot path
      val drop = until - from >= 3 && chars(from) == "（" &&
        chars(from + 1) == "完" && chars(from + 2) == "）"
      if (!drop) {
        out += ((idx, chars.slice(from, until), labels.slice(from, until)))
        idx += 1
      }
    }
    var i = 0
    while (i < chars.length) {
      if (chars(i) == "\n") { emit(last, i); last = i + 1 }
      i += 1
    }
    if (last < chars.length) emit(last, chars.length) // trailing segment (:94)
    out.result()
  }

  /** eval/test file set (`:76-80`). */
  def isEvalTestFile(file: String): Boolean = {
    val m = raw"chtb_(\d{4})\.name".r.findFirstMatchIn(file)
    m.exists { g =>
      val n = g.group(1).toInt
      (n >= 1 && n <= 325) || (n >= 1001 && n <= 1078)
    }
  }

  /** Distributed read: every `.name` file under `pathGlob` (wholetext) →
    * (file, sentence_idx, text array, label array).
    */
  def readNameFiles(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(pathGlob)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .flatMap { case (path, xml) =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        val (chars, labels) = parseNameXml(xml)
        toSentences(chars, labels).map { case (i, t, l) => (file, i, t, l) }
      }
      .toDF("file", "sentence_idx", "text", "label")
  }

  /** Assign splits: train for ordinary files; eval/test files alternate by
    * the global sentence ordinal (odd → eval, even → test, `:89`), ordered
    * by (file, sentence_idx).
    *
    * The global ordinal is computed WITHOUT a global-window sort (which
    * would serialize on one task): `sentence_idx` is dense per file by
    * `toSentences` construction, so ordinal = file offset + sentence_idx +
    * 1, where offsets are the cumulative per-file counts in lexicographic
    * file order. The per-file counts are a distributed aggregate; the
    * cumulative sum runs on the driver over the eval/test FILE LIST — ≤403
    * entries by construction (`chtb_0001–0325` ∪ `chtb_1001–1078`) — and
    * rejoins as a broadcast.
    */
  def withSplit(sentences: DataFrame): DataFrame = {
    val spark = sentences.sparkSession
    import spark.implicits._
    // eager localCheckpoint: the eval/test slice feeds TWO consumers (the
    // counts collect below and the returned join) — without it the XML
    // parse of every eval/test file would run twice. Bounded by the ≤403
    // eval/test files; the checkpoint blocks are reclaimed once the
    // returned plan is GC'd. (The two-pass ordinal inherently makes
    // withSplit launch a job at call time.)
    val evalTest = sentences.filter(isEvalTestUdf(col("file"))).localCheckpoint(true)
    val stats = evalTest.groupBy("file")
      .agg(count(lit(1)).as("_cnt"), max(col("sentence_idx")).as("_mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // the offset formula requires dense 0-based sentence_idx per file (true
    // for readNameFiles output); a filtered/subsetted input would silently
    // flip eval/test assignments after the first gap — fail loudly instead
    stats.foreach { case (f, cnt, mx) =>
      require(cnt == mx + 1,
        s"withSplit needs dense 0-based sentence_idx per file: '$f' has " +
          s"$cnt sentences but max idx $mx — renumber (e.g. row_number per file) first")
    }
    val counts = stats.map { case (f, cnt, _) => (f, cnt) }.sortBy(_._1)
    val offsets = counts.scanLeft(("", 0L)) { case ((_, acc), (f, c)) => (f, acc + c) }
      .sliding(2).collect { case Array((_, off), (f, _)) => (f, off) }.toSeq
    val withOrd = if (offsets.isEmpty) evalTest.withColumn("_ord", lit(1L))
      else evalTest.join(broadcast(offsets.toDF("file", "_off")), "file")
        .withColumn("_ord", col("_off") + col("sentence_idx") + 1)
    val split = withOrd
      .withColumn("split",
        when(pmod(col("_ord"), lit(2)) === 1, "eval").otherwise("test"))
      .drop("_ord", "_off")
    val train = sentences.filter(!isEvalTestUdf(col("file")))
      .withColumn("split", lit("train"))
    split.unionByName(train)
  }
  private val isEvalTestUdf = udf(isEvalTestFile _)

  /** labels.txt contents (`:141-148,165`): "O" + {B,I,E,S}-{type} for the
    * expected types. The reference iterates a python set (arbitrary
    * order); here types are sorted — documented determinism choice.
    */
  def labelList: Seq[String] =
    "O" +: ExpectLabels.toSeq.sorted.flatMap(t =>
      Seq("B", "I", "E", "S").map(p => s"$p-$t"))
}
