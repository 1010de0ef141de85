package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Formats

class FormatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft_fmt")
    val p = d.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("JSONL sentence source parses the reference wire format (cn_data_manager.py:174-194)") {
    // exact fixture from FIXTURES.md §1
    val path = tmpFile("s.jsonl",
      """{"text": ["坐","落","于","福","州"], "label": ["O","O","O","B-LOC","E-LOC"]}
        |{"text": ["你","好"], "label": ["O","O"]}
        |""".stripMargin)
    val df = Formats.readSentencesJsonl(spark, path)
    assert(df.count() == 2)
    val r = df.orderBy(size(col("text")).desc).head()
    assert(r.getSeq[String](0).mkString == "坐落于福州")
    assert(r.getSeq[String](1) == Seq("O", "O", "O", "B-LOC", "E-LOC"))
    assert(df.filter(!col("_valid")).count() == 0)
  }

  test("JSONL strict mode rejects length mismatch (cn_loader.py:91-102)") {
    val path = tmpFile("bad.jsonl", """{"text": ["a","b"], "label": ["O"]}""")
    intercept[IllegalArgumentException] {
      Formats.readSentencesJsonl(spark, path, strict = true).count()
    }
  }

  test("JSONL strict mode rejects malformed JSON and null-text rows (not just length)") {
    // malformed line: without a corrupt-record column it parses to an
    // all-null row that label-IS-NULL leniency would wave through
    intercept[IllegalArgumentException] {
      Formats.readSentencesJsonl(spark,
        tmpFile("m.jsonl", "{not json at all\n"), strict = true).count()
    }
    // null text with a label: the length comparison alone is three-valued
    // null there and would slip past a naive filter
    intercept[IllegalArgumentException] {
      Formats.readSentencesJsonl(spark,
        tmpFile("n.jsonl", """{"label": ["O"]}""" + "\n"), strict = true).count()
    }
    // lenient mode counts both as invalid (no null _valid rows)
    val lenient = Formats.readSentencesJsonl(spark,
      tmpFile("l.jsonl", "{bad\n" + """{"text": ["a"], "label": ["O"]}""" + "\n"))
    assert(lenient.filter(!col("_valid")).count() == 1)
    assert(lenient.filter(col("_valid").isNull).count() == 0)
  }

  test("CoNLL source segments on blank lines (cn_data_manager.py:117-141)") {
    val path = tmpFile("c.conll",
      "我 O\n爱 O\n北 B-LOC\n京 E-LOC\n\n天 B-LOC\n安 I-LOC\n门 E-LOC\n")
    val df = Formats.readConll(spark, path)
    val sents = df.groupBy("sentence_id").agg(
      concat_ws("", collect_list(col("word"))).as("s")).orderBy("sentence_id")
      .collect().map(_.getString(1))
    assert(sents.toSeq == Seq("我爱北京", "天安门"))
    val tags = df.filter(col("word") === "北").select("tag").head().getString(0)
    assert(tags == "B-LOC")
  }

  test("CoNLL distributed segmentation: multi-split result == single-split result") {
    // force ~24-byte input splits so the file spans MANY partitions — the
    // two-pass base computation must reproduce the serial numbering exactly
    val content = (0 until 40).map { s =>
      (0 until 3).map(t => s"w${s}_$t T$s").mkString("\n")
    }.mkString("\n\n") + "\n"
    val path = tmpFile("big.conll", content)
    def rows(maxSplit: Long) =
      Formats.readConll(spark, path, maxSplitBytes = maxSplit)
        .orderBy("line_no").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    val single = rows(-1)
    val multi = rows(24)
    assert(single == multi, "multi-split numbering diverged from serial")
    assert(single.map(_._1).distinct.size == 40) // 40 sentences
    // a genuinely multi-partition read, not an accidental one-split run
    assert(Formats.linesWithOffsets(spark, path, 24).getNumPartitions > 4)
  }

  test("CoNLL multi-file read: file boundaries start new sentences, path order is deterministic") {
    val d = Files.createTempDirectory("graft_conll")
    Files.writeString(d.resolve("a.conll"), "x1 A\nx2 B\n")   // no trailing blank
    Files.writeString(d.resolve("b.conll"), "y1 C\n\ny2 D\n")
    val df = Formats.readConll(spark, s"$d/*.conll")
    val sents = df.groupBy("sentence_id")
      .agg(concat_ws(" ", transform(
        sort_array(collect_list(struct(col("line_no"), col("word")))),
        x => x.getField("word"))).as("words"))
      .orderBy("sentence_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // file a = sentence 0; file b starts a NEW sentence even though a has no
    // trailing blank line; b's own blank line then opens sentence 2
    assert(sents == Map(0L -> "x1 x2", 1L -> "y1", 2L -> "y2"), s"got $sents")
  }

  test("CoNLL extreme drops pattern rows before segmentation (cn_data_manager.py:146-172)") {
    val path = tmpFile("c2.conll", "a O\n， O\nb B-PER\n")
    val df = Formats.readConllExtreme(spark, path, dropPattern = "， O")
    assert(df.count() == 2)
    assert(!df.select("word").collect().map(_.getString(0)).contains("，"))
  }

  test("embedding text source: header skipped, last-dim values taken (embedding.py:14-34)") {
    val path = tmpFile("e.txt",
      "3 4\nfoo 0.1 0.2 0.3 0.4\nbar 1 2 3 4\nbaz 9 9 9 9\n")
    val df = Formats.readEmbeddingTxt(spark, path)
    assert(df.count() == 3)
    val foo = df.filter(col("word") === "foo").head().getSeq[Float](1)
    assert(foo == Seq(0.1f, 0.2f, 0.3f, 0.4f))
  }

  test("embedding source: only the header line is dropped, not two-integer DATA lines") {
    // dim-1 file: "2016 7" is a VALID row (word "2016", vector [7.0]) that
    // the old any-two-ints regex silently dropped from anywhere in the file
    val path = tmpFile("e3.txt", "3 1\nalpha 0.5\n2016 7\nbeta 1.5\n")
    val got = Formats.readEmbeddingTxt(spark, path).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(got.keySet == Set("alpha", "2016", "beta"), s"got ${got.keySet}")
    assert(got("2016") == Seq(7f))
    // empty file: empty DataFrame, not a first() crash
    assert(Formats.readEmbeddingTxt(spark, tmpFile("e4.txt", "")).count() == 0)
  }

  test("embedding source: per-file positional header drop on a multi-file glob") {
    val d = Files.createTempDirectory("graft_emb")
    // file a HAS a header; file b is headerless and its first line is a
    // valid dim-1 data row "2 1" (word "2", vector [1.0]) — value-equality
    // filtering against a's header would silently kill it; a MID-file row
    // equal to a's header ("2 1" in file a) must survive too
    Files.writeString(d.resolve("a.txt"), "2 1\nalpha 0.5\n2 1\n")
    Files.writeString(d.resolve("b.txt"), "2 1\nbeta 1.5\n")
    val got = Formats.readEmbeddingTxt(spark, s"$d/*.txt", dim0 = 1).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toSeq
    // a's offset-0 header dropped; BOTH "2 1" data rows (mid-file a,
    // first-line b... b's offset-0 line is header-looking so it IS dropped)
    assert(got.toMap == Map("alpha" -> Seq(0.5f), "2" -> Seq(1f), "beta" -> Seq(1.5f)),
      s"got $got")
    assert(got.count(_._1 == "2") == 1) // exactly one "2 1" survivor (mid-file a)
  }

  test("OntoNotes4 .name XML → char BMES sentences (ontonotes4.py:18-120)") {
    import graft.io.OntoNotes
    val xml =
      "<DOC>leading text is dropped\n" +
        "<ENAMEX TYPE=\"PERSON\">张 三</ENAMEX>在<ENAMEX TYPE=\"ORG\">百度 总部</ENAMEX>工作\n" +
        "<ENAMEX TYPE=\"DATE\">昨天</ENAMEX>下雨\n（完）声明\n" +
        "<ENAMEX TYPE=\"GPE\">京</ENAMEX></DOC>"
    val (chars, labels) = OntoNotes.parseNameXml(xml)
    val sents = OntoNotes.toSentences(chars, labels)
    val byIdx = sents.map(s => s._1 -> (s._2.mkString, s._3)).toMap
    // root.text ("leading text…") dropped entirely — sentence 0 starts at 张
    assert(byIdx(0)._1 == "张三在百度总部工作") // inner space stripped
    assert(byIdx(0)._2 == Seq("B-PERSON", "E-PERSON", "O",
      "B-ORG", "I-ORG", "I-ORG", "E-ORG", "O", "O"))
    assert(byIdx(1)._1 == "昨天下雨") // DATE not in expect set → all O
    assert(byIdx(1)._2.forall(_ == "O"))
    // "（完）声明" dropped; final sentence is the single-char GPE → S- tag
    assert(byIdx(2)._1 == "京" && byIdx(2)._2 == Seq("S-GPE"))
    assert(sents.length == 3)
    assert(OntoNotes.labelList.head == "O" && OntoNotes.labelList.contains("S-GPE")
      && OntoNotes.labelList.length == 17)
  }

  test("OntoNotes4: ElementTree .text parity on nested markup; DOCTYPE rejected") {
    import graft.io.OntoNotes
    // nested element inside an ENAMEX: the reference's child.text sees ONLY
    // the text before the nested element ("张" here) — DOM getTextContent
    // would see 张三 and shift the whole downstream char stream
    val xml = "<DOC>x\n<ENAMEX TYPE=\"PERSON\">张<b>三</b>后</ENAMEX>在家</DOC>"
    val (chars, labels) = OntoNotes.parseNameXml(xml)
    assert(chars.mkString == "张在家", chars)
    assert(labels == Vector("S-PERSON", "O", "O"), labels)
    // XXE hardening: any DOCTYPE (the external-entity vector) is rejected
    intercept[org.xml.sax.SAXParseException] {
      OntoNotes.parseNameXml(
        "<!DOCTYPE d [<!ENTITY x SYSTEM \"file:///etc/hostname\">]><DOC>a\n&x;</DOC>")
    }
  }

  test("OntoNotes4 distributed read + eval/test alternation (ontonotes4.py:74-100)") {
    import graft.io.OntoNotes
    val dir = java.nio.file.Files.createTempDirectory("onto").toString
    def write(name: String, body: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, name), body)
    // eval/test file: 3 sentences → ordinals 1,2,3 → eval,test,eval
    write("chtb_0001.name",
      "<DOC><ENAMEX TYPE=\"LOC\">奥斯陆</ENAMEX>甲\n乙\n丙</DOC>")
    // second eval/test file: the GLOBAL ordinal must continue across files
    // (ordinals 4,5 → test,eval) — pins the distributed two-pass offset
    write("chtb_0002.name", "<DOC><ENAMEX TYPE=\"GPE\">挪威</ENAMEX>戊\n己</DOC>")
    // train file
    write("vom_0099.name", "<DOC><ENAMEX TYPE=\"ORG\">微软</ENAMEX>丁</DOC>")
    val parsed = OntoNotes.readNameFiles(spark, s"$dir/*.name")
    val splitDf = OntoNotes.withSplit(parsed)
    // the global ordinal must NOT come from a global-window sort: no
    // single-partition exchange anywhere in the plan
    assert(!splitDf.queryExecution.executedPlan.toString.contains("SinglePartition"),
      "withSplit must not plan a single-partition global sort")
    val withSplit = splitDf
      .select("file", "sentence_idx", "split").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(withSplit(("chtb_0001.name", 0)) == "eval")
    assert(withSplit(("chtb_0001.name", 1)) == "test")
    assert(withSplit(("chtb_0001.name", 2)) == "eval")
    assert(withSplit(("chtb_0002.name", 0)) == "test")
    assert(withSplit(("chtb_0002.name", 1)) == "eval")
    assert(withSplit(("vom_0099.name", 0)) == "train")
    val loc = OntoNotes.readNameFiles(spark, s"$dir/chtb_0001.name")
      .filter(col("sentence_idx") === 0).select("label").head().getSeq[String](0)
    assert(loc == Seq("B-LOC", "I-LOC", "E-LOC", "O"))
    graft.io.SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("embedding source: multi-token words survive; wrong-dim lines dropped (embedding.py:29-31)") {
    val path = tmpFile("e2.txt",
      "4 3\nNew York 1 2 3\nshort 1 2\nok 4 5 6\nlong word here 7 8 9\n")
    val got = Formats.readEmbeddingTxt(spark, path).collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(got.keySet == Set("New York", "ok", "long word here"))
    assert(got("New York") == Seq(1f, 2f, 3f))
    assert(got("long word here") == Seq(7f, 8f, 9f))
  }

  test("vocab source takes first token per line, maxScan caps (vocab.py:36-63)") {
    val path = tmpFile("v.txt", "alpha 1 2\nbeta\ngamma x\ndelta\n")
    assert(Formats.readVocabTxt(spark, path).collect().map(_.getString(0)).toSeq
      == Seq("alpha", "beta", "gamma", "delta"))
    assert(Formats.readVocabTxt(spark, path, maxScan = 2).count() == 2)
  }

  test("tagged vocab JSONL: [word, tags] incl. char-list words (vocab_tag.py:58-71)") {
    val path = tmpFile("tv.jsonl",
      """["福州", ["B-LOC", "E-LOC"]]
        |[["北","京"], ["B-LOC", "E-LOC"]]
        |""".stripMargin)
    val got = Formats.readTaggedVocabJsonl(spark, path).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got.keySet == Set("福州", "北京"))
    assert(got("北京") == Seq("B-LOC", "E-LOC"))
  }

  test("span-JSON → BMES char rows (to_json.py converters)") {
    val df = Seq((1L, "x福州y", Seq((1, 3, "LOC")))).toDF("doc_id", "text", "raw")
      .withColumn("spans", expr(
        "transform(raw, r -> named_struct('start', r._1, 'end', r._2, 'label', r._3))"))
      .drop("raw")
    val tags = Formats.spansToCharTags(df).orderBy("pos")
      .collect().map(r => (r.getString(2), r.getString(3)))
    assert(tags.toSeq == Seq(("x", "O"), ("福", "B-LOC"), ("州", "E-LOC"), ("y", "O")))
  }

  test("single-char span becomes S- (get_labels has_single semantics)") {
    val df = Seq((1L, "a福b", Seq((1, 2, "LOC")))).toDF("doc_id", "text", "raw")
      .withColumn("spans", expr(
        "transform(raw, r -> named_struct('start', r._1, 'end', r._2, 'label', r._3))"))
      .drop("raw")
    val tag = Formats.spansToCharTags(df).filter(col("ch") === "福")
      .head().getString(3)
    assert(tag == "S-LOC")
  }

  test("label merge preserves first-seen order (merge_json.py:17-33)") {
    val merged = Formats.mergeLabelLists(
      Seq(Seq("O", "B-PER"), Seq("B-PER", "B-ORG"), Seq("O", "S-LOC")))
    assert(merged == Seq("O", "B-PER", "B-ORG", "S-LOC"))
  }

  test("sentence JSONL round-trip (predictions sink, weibo.py:57-64)") {
    val out = Files.createTempDirectory("graft_snk").toString + "/pred"
    val df = Seq((Seq("a", "b"), Seq("O", "O"))).toDF("text", "label")
    Formats.writeSentencesJsonl(df, out)
    val back = Formats.readSentencesJsonl(spark, out)
    assert(back.count() == 1)
    assert(back.head().getSeq[String](0) == Seq("a", "b"))
  }
}
