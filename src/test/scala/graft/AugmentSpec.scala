package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.ops.Augment
import graft.stages.{Detect, Eval, Pipeline}
import graft.synth.Transcripts

class AugmentSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val turns = Transcripts.turns(spark, 40)
  private var mentionsCached = false
  private lazy val mentions = {
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    val m = Detect.run(turns, tagger).toDF().cache()
    mentionsCached = true
    m
  }

  override def afterAll(): Unit = {
    if (mentionsCached) mentions.unpersist() // shared session — release blocks
    super.afterAll()
  }

  test("label collection groups surfaces by (label, length) (label_collections.py:63-95)") {
    val coll = Augment.labelCollection(mentions).collect()
    assert(coll.nonEmpty)
    coll.foreach { r =>
      val len = r.getInt(1)
      assert(r.getSeq[String](2).forall(_.length == len))
    }
  }

  test("replacement expansion: same label+length, provenance, determinism (expand_data.py:56-111)") {
    val exp1 = Augment.expandByReplacement(turns, mentions, copies = 2)
    val exp2 = Augment.expandByReplacement(turns, mentions, copies = 2)
    val rows1 = exp1.orderBy("conv_id", "turn_idx", "attempt").collect()
    val rows2 = exp2.orderBy("conv_id", "turn_idx", "attempt").collect()
    assert(rows1.nonEmpty)
    // determinism under recomputation (seeded per-row RNG, no global state)
    assert(rows1.map(_.toString).toSeq == rows2.map(_.toString).toSeq)
    // replaced text differs from origin but length class is preserved per span
    val origin = turns.toDF().select(col("conv_id"), col("turn_idx"), col("text").as("orig"))
    val joined = exp1.join(origin, Seq("conv_id", "turn_idx"))
    assert(joined.filter(col("text") === col("orig")).count() == 0)
  }

  test("fused expansion ≡ expandByReplacement over Detect.run (round-7 q34 path)") {
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("conv_id", "turn_idx", "attempt").collect().map(_.toString).toSeq
    val staged = rows(Augment.expandByReplacement(turns, mentions, copies = 2))
    val fused = rows(Augment.expandDetected(turns, tagger, copies = 2))
    assert(staged.nonEmpty && fused == staged)
    // the fused plan carries no join and no mention exchange
    val plan = Augment.expandDetected(turns, tagger, copies = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"fused expansion must not join:\n$plan")
  }

  test("expanded copies still parse: re-detection finds same span structure") {
    val exp = Augment.expandByReplacement(turns, mentions, copies = 1)
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    val asTurns = exp.select(col("conv_id"), col("turn_idx"), lit("user").as("role"),
      col("text"), lit(null).cast("string").as("tool"),
      lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts")).as[Turn]
    val redetected = Detect.run(asTurns, tagger).toDF()
    val perTurnOrig = mentions.groupBy("conv_id", "turn_idx").count()
      .withColumnRenamed("count", "n_orig")
    val perTurnNew = redetected.groupBy("conv_id", "turn_idx").count()
      .withColumnRenamed("count", "n_new")
    // every expanded turn yields at least as many mentions as the original
    // (replacement surfaces are all dictionary entries)
    val bad = perTurnNew.join(perTurnOrig, Seq("conv_id", "turn_idx"))
      .filter(col("n_new") < col("n_orig"))
    assert(bad.count() == 0)
  }

  test("self-labeling vocabulary produces per-char tags (t1.py:154-175)") {
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    val words = Seq("Berlin", "Acme Corp", "nonsense").toDF("word")
    val labeled = Augment.selfLabelVocab(spark, words, tagger).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(labeled("Berlin").head == "B-LOC")
    assert(labeled("Acme Corp").head == "B-ORG")
    assert(labeled("nonsense").forall(_ == "O"))
    assert(labeled.forall { case (w, tags) => tags.length == w.length })
  }

  test("embedding gather: hits keep pretrained, misses get deterministic seeded vectors (embedding.py:45-69)") {
    val emb = Seq(("known", Array(1f, 2f, 3f, 4f))).toDF("word", "embedding")
    val vocab = Seq("known", "miss1", "miss2").toDF("word")
    val g1 = Augment.embeddingGather(vocab, emb, dim = 4).collect()
      .map(r => (r.getString(0), r.getSeq[Float](1), r.getBoolean(2))).sortBy(_._1)
    val g2 = Augment.embeddingGather(vocab, emb, dim = 4).collect()
      .map(r => (r.getString(0), r.getSeq[Float](1), r.getBoolean(2))).sortBy(_._1)
    assert(g1.toSeq == g2.toSeq) // deterministic fallback
    val known = g1.find(_._1 == "known").get
    assert(known._2 == Seq(1f, 2f, 3f, 4f) && known._3)
    val miss = g1.find(_._1 == "miss1").get
    assert(!miss._3)
    val bound = math.sqrt(3.0 / 4).toFloat
    assert(miss._2.forall(v => v >= -bound && v <= bound))
    assert(g1.find(_._1 == "miss2").get._2 != miss._2) // per-word seeding
  }

  test("overlap + exceptSeen set semantics (NER.ipynb / expand_data.py:66-72)") {
    val train = Seq("a", "b", "c").toDF("text")
    val dev = Seq("b", "d").toDF("text")
    assert(Augment.overlap(train, dev).collect().map(_.getString(0)).toSeq == Seq("b"))
    val newItems = Seq("x", "b").toDF("text")
    assert(Augment.exceptSeen(newItems, train, Seq("text"))
      .collect().map(_.getString(0)).toSeq == Seq("x"))
  }
}

class EvalReportSpec extends SparkSpecBase {
  import spark.implicits._

  test("per-type rollup report (classification_report analog)") {
    val pred = Seq(
      ("c1", 0, 0, 2, "PER"), ("c1", 0, 3, 5, "ORG"), ("c1", 1, 0, 2, "PER"))
      .toDF("conv_id", "turn_idx", "start", "end", "label")
    val gold = Seq(
      ("c1", 0, 0, 2, "PER"), ("c1", 0, 3, 5, "ORG"), ("c1", 1, 4, 6, "PER"))
      .toDF("conv_id", "turn_idx", "start", "end", "label")
    val rep = Eval.perTypeReport(pred, gold).collect()
      .map(r => Option(r.getString(0)).getOrElse("TOTAL") ->
        (r.getDouble(4), r.getDouble(5))).toMap
    assert(rep("ORG") == ((1.0, 1.0)))
    assert(rep("PER") == ((0.5, 0.5)))
    assert(rep("TOTAL")._1 > 0.6 && rep("TOTAL")._1 < 0.7) // 2/3 micro
  }

  test("pipeline scores 1.0 everywhere in the per-type report") {
    val r = Pipeline.run(spark, 40)
    val gold = Transcripts.goldMentions(spark, 40).toDF()
    val rep = Eval.perTypeReport(r.mentions, gold)
    assert(rep.filter(col("f1") < 1.0).count() == 0)
  }

  test("single-exchange report ≡ reference distinct+full_outer (incl. null keys, dupes)") {
    import org.apache.spark.sql.DataFrame
    // the round-7 union+groupBy rewrite must reproduce the old
    // distinct+full_outer implementation EXACTLY — including the SQL-join
    // corner where NULL keys never match (each side keeps its own row)
    // and input duplicates (collapsed by the per-side distinct)
    def reference(pred: DataFrame, gold: DataFrame, keys: Seq[String],
                  typeCol: String): DataFrame = {
      val p = pred.select(keys.map(col): _*).distinct()
      val g = gold.select(keys.map(col): _*).distinct()
      p.withColumn("in_pred", lit(1))
        .join(g.withColumn("in_gold", lit(1)), keys, "full_outer")
        .select(col(typeCol).as("label"),
          coalesce(col("in_pred"), lit(0)).as("in_pred"),
          coalesce(col("in_gold"), lit(0)).as("in_gold"))
        .rollup(col("label"))
        .agg(sum(col("in_pred") * col("in_gold")).as("n_match"),
          sum(col("in_pred")).as("n_pred"),
          sum(col("in_gold")).as("n_gold"))
    }
    val rnd = new scala.util.Random(77)
    def corpus() = Seq.fill(60)((
        s"c${rnd.nextInt(3)}", rnd.nextInt(3), rnd.nextInt(4), rnd.nextInt(4),
        if (rnd.nextInt(6) == 0) null else Seq("PER", "ORG", "LOC")(rnd.nextInt(3))))
      .toDF("conv_id", "turn_idx", "start", "end", "label")
    val pred = corpus(); val gold = corpus()
    def key(r: org.apache.spark.sql.Row) =
      (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3))
    val got = Eval.perTypeReport(pred, gold)
      .select("label", "n_match", "n_pred", "n_gold").collect().map(key).sorted.toSeq
    val want = reference(pred, gold, Eval.spanKeys, "label")
      .select("label", "n_match", "n_pred", "n_gold").collect().map(key).sorted.toSeq
    assert(got.nonEmpty && got == want, s"\n got=$got\nwant=$want")
    // and the plan actually dropped the join: ONE union-side aggregate, no Join
    val plan = Eval.perTypeReport(pred, gold).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"report must not join:\n$plan")
  }
}
