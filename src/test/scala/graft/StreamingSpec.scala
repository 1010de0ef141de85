package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core._
import graft.stages.Detect
import graft.streaming.StreamingDetect
import graft.synth.Transcripts

/** Structured Streaming path: detect over a streaming source, watermarked
  * event-time windows (SURVEY.md §2.9 extension).
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkTurn(conv: String, idx: Int, text: String, minute: Int): Turn =
    Turn(conv, idx, "user", text, null,
      Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"))

  test("streaming detect emits mentions incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    val src = MemoryStream[Turn]
    src.addData(
      mkTurn("c1", 0, "Alice Varga joined Acme Corp last week", 0),
      mkTurn("c1", 1, "no entities here", 1))
    val q = StreamingDetect.mentions(src.toDS(), tagger)
      .writeStream.format("memory").queryName("m_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // incremental: a second micro-batch arrives after the first completed
      src.addData(mkTurn("c2", 0, "Grace Obi flew to Lisbon", 2))
      q.processAllAvailable()
    } finally q.stop() // a leaked query would poison later suites' job counts
    val rows = spark.sql("SELECT label, surface FROM m_out ORDER BY label, surface")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("LOC", "Lisbon"), ("ORG", "Acme Corp"),
      ("PER", "Alice Varga"), ("PER", "Grace Obi")))
  }

  test("watermarked tumbling windows aggregate mention counts per label") {
    implicit val sqlCtx = spark.sqlContext
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    val src = MemoryStream[Turn]
    val q = StreamingDetect.windowedMentionCounts(src.toDS(), tagger,
        windowLen = "5 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("w_out")
      .outputMode("append").start()
    // two windows of data, then events far enough ahead to advance the
    // watermark past them (the watermark advances at batch BOUNDARIES, so a
    // third batch is needed for the closing event to take effect)
    try {
      src.addData(
        mkTurn("c1", 0, "Alice Varga met Bob Castillo", 0),   // win 10:00
        mkTurn("c1", 1, "Berlin office of Acme Corp", 2),     // win 10:00
        mkTurn("c2", 0, "Hiro Tanaka visited Osaka", 7))      // win 10:05
      q.processAllAvailable()
      src.addData(mkTurn("c3", 0, "advancing the watermark", 59))
      q.processAllAvailable()
      src.addData(mkTurn("c3", 1, "and flushing closed windows", 59))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql(
      "SELECT window_start, label, n_mentions FROM w_out ORDER BY window_start, label")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "PER", 2L)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "ORG", 1L)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "LOC", 1L)))
    assert(rows.contains(("2024-01-01 10:05:00.0", "PER", 1L)))
    assert(rows.contains(("2024-01-01 10:05:00.0", "LOC", 1L)))
  }
}

class StreamingTriplesSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.streaming.StreamingTriples

  private def cm(conv: String, turn: Int, start: Int, label: String,
                 canon: String): CanonMention =
    CanonMention(conv, turn, start, start + 3, label, "xxx", canon, canon)

  test("stateful incremental triples match the batch rules across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[CanonMention]
    // batch 1: turn 0 with PER+ORG, turn 1 with PER
    src.addData(
      cm("c1", 0, 0, "PER", "PER00"), cm("c1", 0, 10, "ORG", "ORG00a"),
      cm("c1", 1, 0, "PER", "PER01"))
    val q = StreamingTriples.assemble(src.toDS())
      .writeStream.format("memory").queryName("t_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: turn 2 with PER — cross-turn vs turn 1's PER, carried in state
      src.addData(cm("c1", 2, 0, "PER", "PER02"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT subj, pred, obj, turn_idx FROM t_out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(got == Set(
      ("PER00", "affiliated_with", "ORG00a", 0),
      ("PER01", "follows_up", "PER00", 1),   // state from batch-1 turn 0
      ("PER02", "follows_up", "PER01", 2)))  // state carried ACROSS batches
  }

  test("event-time eviction: idle conversations lose state; late turns are dropped") {
    import java.sql.Timestamp
    import graft.streaming.StreamingTriples.TimedCanonMention
    implicit val sqlCtx = spark.sqlContext
    def tcm(conv: String, turn: Int, start: Int, canon: String, minute: Int) =
      TimedCanonMention(conv, turn, start, start + 3, "PER", "xxx", canon, canon,
        Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00"))
    val src = MemoryStream[TimedCanonMention]
    val q = StreamingTriples.assembleWithEviction(src.toDS(),
        watermark = "10 minutes", idleGap = "5 minutes")
      .writeStream.format("memory").queryName("ev_out").outputMode("append").start()
    try {
      // batch 1: conv A turn 0 (PER00) at 10:00
      src.addData(tcm("A", 0, 0, "PER00", 0))
      q.processAllAvailable()
      // batch 2: unrelated conv B far ahead (minute 120) — advances the
      // watermark to ~11:50, far past A's 10:00 + 5min idle gap
      src.addData(tcm("B", 0, 0, "PER90", 120))
      q.processAllAvailable()
      // batch 3: another B event so the timer actually fires in a batch whose
      // watermark already covers A's timeout
      src.addData(tcm("B", 1, 0, "PER91", 121))
      q.processAllAvailable()
      // batch 4a: LATE turn for A (10:01, below watermark) → dropped entirely
      src.addData(tcm("A", 1, 0, "PER01", 1))
      q.processAllAvailable()
      // batch 4b: fresh A turn ABOVE the watermark: state was evicted, so no
      // follows_up against PER00 even though turn_idx is adjacent
      src.addData(tcm("A", 1, 0, "PER01", 125))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql("SELECT subj, pred, obj, conv_id FROM ev_out")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    // B's own follows_up proves the handler still works; A must have NONE
    assert(got.contains(("PER91", "follows_up", "PER90", "B")))
    assert(!got.exists(t => t._4 == "A" && t._2 == "follows_up"),
      s"evicted conversation A still emitted follows_up: $got")
  }

  test("out-of-order turns within the watermark still assemble (matches batch)") {
    import java.sql.Timestamp
    import graft.streaming.StreamingTriples.TimedCanonMention
    implicit val sqlCtx = spark.sqlContext
    def tcm(turn: Int, start: Int, label: String, canon: String) =
      TimedCanonMention("A", turn, start, start + 3, label, "xxx", canon, canon,
        Timestamp.valueOf(f"2024-01-01 10:$turn%02d:00"))
    val turns = Map(
      0 -> Seq(tcm(0, 0, "PER", "PER00"), tcm(0, 10, "ORG", "ORG00a")),
      1 -> Seq(tcm(1, 0, "PER", "PER01")),
      2 -> Seq(tcm(2, 0, "PER", "PER02"), tcm(2, 10, "PER", "PER02b")),
      3 -> Seq(tcm(3, 0, "PER", "PER03")))
    val src = MemoryStream[TimedCanonMention]
    // compound interval: idleGap must accept every form Spark's own
    // watermark parser does (pins the delay-parsing contract)
    val q = graft.streaming.StreamingTriples.assembleWithEviction(src.toDS(),
        watermark = "30 minutes", idleGap = "1 hour 30 minutes")
      .writeStream.format("memory").queryName("ooo_out").outputMode("append").start()
    // whole turns arrive SHUFFLED across micro-batches: 2, 0, 3, 1 — every
    // arrival stays within the watermark window
    try Seq(2, 0, 3, 1).foreach { t => src.addData(turns(t)); q.processAllAvailable() }
    finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))
    val streamed = spark.sql("SELECT subj, pred, obj, turn_idx FROM ooo_out")
      .collect().map(key).sorted.toSeq
    val batchInput = turns.values.flatten.toSeq
      .map(t => CanonMention(t.conv_id, t.turn_idx, t.start, t.end, t.label,
        t.surface, t.entity_id, t.canonical_id)).toDS()
    val batch = graft.stages.Triples.run(batchInput).toDF()
      .select("subj", "pred", "obj", "turn_idx").collect().map(key).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"out-of-order stream diverged from batch:\n  stream=$streamed\n  batch=$batch")
  }

  test("packed-state eviction path ≡ string-state path (out-of-order + eviction scenarios)") {
    import java.sql.Timestamp
    import graft.streaming.StreamingTriples.TimedCanonMention
    implicit val sqlCtx = spark.sqlContext
    val dict = graft.stages.Pipeline.transcriptsDict
    def tcm(conv: String, turn: Int, start: Int, label: String, canon: String,
            minute: Int) =
      TimedCanonMention(conv, turn, start, start + 3, label, "xxx", canon, canon,
        Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00"))
    // out-of-order turns, an idle conversation that gets evicted, and a late
    // drop — the scenarios the two state layouts must agree on. Canonical
    // ids come from the transcripts dict so the packed path can rank them.
    val batches = Seq(
      Seq(tcm("A", 2, 0, "PER", "PER02", 2), tcm("A", 2, 10, "PER", "PER03", 2)),
      Seq(tcm("A", 0, 0, "PER", "PER00", 0), tcm("A", 0, 10, "ORG", "ORG00a", 0),
        tcm("A", 0, 20, "LOC", "LOC01", 0)),
      Seq(tcm("A", 3, 0, "PER", "PER04", 3)),
      Seq(tcm("A", 1, 0, "PER", "PER01", 1)),
      Seq(tcm("B", 0, 0, "PER", "PER05", 120)), // advances watermark far past A
      Seq(tcm("B", 1, 0, "PER", "PER06", 121)), // fires A's eviction timer
      Seq(tcm("A", 4, 0, "PER", "PER07", 125))) // A evicted: no follows_up to 3
    def run(encoded: Boolean, name: String): Seq[(String, String, String, String, Int)] = {
      val src = MemoryStream[TimedCanonMention]
      val ds =
        if (encoded) graft.streaming.StreamingTriples.assembleWithEvictionEncoded(
          src.toDS(), dict, watermark = "10 minutes", idleGap = "5 minutes")
        else graft.streaming.StreamingTriples.assembleWithEviction(
          src.toDS(), watermark = "10 minutes", idleGap = "5 minutes")
      val q = ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => src.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.sql(s"SELECT subj, pred, obj, conv_id, turn_idx FROM $name")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getInt(4))).sorted.toSeq
    }
    val plain = run(encoded = false, "pk_plain")
    val packed = run(encoded = true, "pk_packed")
    assert(plain.nonEmpty && plain.exists(_._2 == "follows_up"))
    assert(packed == plain, s"packed state diverged:\n  packed=$packed\n  plain=$plain")
  }

  test("packed-state path fails LOUDLY on a canonical id outside the dict") {
    import java.sql.Timestamp
    import graft.streaming.StreamingTriples.TimedCanonMention
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[TimedCanonMention]
    src.addData(TimedCanonMention("A", 0, 0, 3, "PER", "xxx", "ZZZ99", "ZZZ99",
      Timestamp.valueOf("2024-01-01 10:00:00")))
    val q = graft.streaming.StreamingTriples.assembleWithEvictionEncoded(
        src.toDS(), graft.stages.Pipeline.transcriptsDict)
      .writeStream.format("memory").queryName("pk_loud").outputMode("append").start()
    val e = intercept[Exception] { try q.processAllAvailable() finally q.stop() }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("canonical_id not in dict")),
      s"got: ${msgs(e)}")
  }

  test("streaming triples equal batch triples on a full replayed corpus") {
    implicit val sqlCtx = spark.sqlContext
    val r = graft.stages.Pipeline.run(spark, 25)
    val canon = r.canon.as[CanonMention].collect().toSeq
    val src = MemoryStream[CanonMention]
    val q = StreamingTriples.assemble(src.toDS())
      .writeStream.format("memory").queryName("t_out2").outputMode("append").start()
    // feed in two turn-ordered chunks, split at a TURN boundary (a turn's
    // mentions must land in one micro-batch — the handler treats each
    // invocation's rows per turn as complete)
    val ordered = canon.sortBy(m => (m.conv_id, m.turn_idx, m.start))
    var cut = ordered.size / 2
    while (cut < ordered.size && ordered(cut - 1).conv_id == ordered(cut).conv_id &&
           ordered(cut - 1).turn_idx == ordered(cut).turn_idx) cut += 1
    val (first, second) = ordered.splitAt(cut)
    try {
      src.addData(first); q.processAllAvailable()
      src.addData(second); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getInt(4))
    val streamed = spark.sql("SELECT subj, pred, obj, conv_id, turn_idx FROM t_out2")
      .collect().map(key).sorted.toSeq
    val batch = graft.stages.Triples.run(r.canon.as[CanonMention]).toDF()
      .select("subj", "pred", "obj", "conv_id", "turn_idx")
      .collect().map(key).sorted.toSeq
    assert(streamed == batch)
  }

  test("exactly-once across a query RESTART: checkpointed state resumes, no dupes, no losses") {
    import java.nio.file.Files
    // the streaming analogue of ResumeSpec: stop the query mid-corpus,
    // restart from the checkpoint, and require the total emitted triple
    // multiset to equal batch — which proves BOTH that the per-conversation
    // state (last turn's PERs) was restored across the restart (the
    // follows_up pairs spanning the cut exist) and that no triple was
    // re-emitted (the checkpoint + file-sink commit log give exactly-once)
    val base = Files.createTempDirectory("graft_restart")
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    val chk = base.resolve("chk"); val outDir = base.resolve("out")
    val all = for {
      c <- Seq("A", "B"); t <- 0 until 4
      m <- cm(s"c$c", t, 0, "PER", s"PER_${c}$t") ::
           (if (t % 2 == 0) List(cm(s"c$c", t, 10, "ORG", s"ORG_${c}$t")) else Nil)
    } yield m
    // cut at a turn boundary: turns 0-1 before the restart, 2-3 after, so
    // every conversation has a follows_up pair CROSSING the restart
    val (first, second) = all.partition(_.turn_idx < 2)
    def writeBatch(rows: Seq[CanonMention]): Unit =
      spark.createDataset(rows).repartition(1)
        .write.mode("append").json(srcDir.toString)
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[CanonMention]].schema)
        .json(srcDir.toString).as[CanonMention]
      val q = StreamingTriples.assemble(src)
        .writeStream.format("parquet").option("path", outDir.toString)
        .option("checkpointLocation", chk.toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    writeBatch(first); runOnce()  // run 1: first half, then STOP
    writeBatch(second); runOnce() // run 2: restart — state from checkpoint
    runOnce()                     // run 3: restart with NO new data
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getInt(4))
    // reading via the sink's _spark_metadata commit log: only files whose
    // batch COMMITTED count — the exactly-once read surface
    val streamed = spark.read.parquet(outDir.toString)
      .select("subj", "pred", "obj", "conv_id", "turn_idx")
      .collect().map(key).sorted.toSeq
    val batch = graft.stages.Triples.run(spark.createDataset(all)).toDF()
      .select("subj", "pred", "obj", "conv_id", "turn_idx")
      .collect().map(key).sorted.toSeq
    assert(batch.exists(t => t._2 == "follows_up" && t._5 == 2),
      "fixture must have follows_up pairs crossing the restart cut")
    assert(streamed == batch,
      s"restarted stream diverged from batch:\n  stream=$streamed\n  batch=$batch")
    graft.io.SnapshotIO.deleteRecursively(base)
  }
}

class MetricsSpec extends SparkSpecBase {
  import graft.io.SnapshotIO
  import graft.stages.Pipeline
  import org.apache.spark.sql.functions._

  test("snapshot layer records per-partition lineage counters (north_rule)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics").toString
    Pipeline.runWithSnapshots(spark, 20, dir).count()
    val m = SnapshotIO.metrics(spark, dir)
    val stages = m.select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("transcripts", "mentions", "linked", "canon", "triples"))
    // per-partition rows sum to the manifest's committed row count
    val triplesTotal = m.filter(col("stage") === "triples")
      .agg(sum("rows")).head().getLong(0)
    val actual = spark.read.parquet(
      SnapshotIO.snapshotDir(dir, "triples",
        "n20_s42").toString).count()
    assert(triplesTotal == actual)
    // retry-safe manifest counters: every total in the mentions manifest is
    // a count over COMMITTED snapshot data, so it must equal the dataset
    // counts exactly (accumulator-derived figures could not promise this
    // under task retries / speculative execution)
    val mentionsDir = SnapshotIO.snapshotDir(dir, "mentions", "n20_s42")
    val manifest = java.nio.file.Files.readString(mentionsDir.resolve("_manifest.json"))
    val turnsIn = """"turns_in":(\d+)""".r.findFirstMatchIn(manifest).map(_.group(1).toLong)
    val rowsField = """"rows":(\d+)""".r.findFirstMatchIn(manifest).map(_.group(1).toLong)
    val nTurns = spark.read.parquet(
      SnapshotIO.snapshotDir(dir, "transcripts", "n20_s42").toString).count()
    val nMentions = spark.read.parquet(mentionsDir.toString).count()
    assert(turnsIn.contains(nTurns), s"turns_in=$turnsIn != $nTurns in $manifest")
    assert(rowsField.contains(nMentions), s"rows=$rowsField != $nMentions in $manifest")
    assert(nMentions > 0, "fixture must produce mentions")
    // a distinct `version` forces a fresh snapshot key (staleness contract)
    Pipeline.runWithSnapshots(spark, 20, dir, version = "2").count()
    assert(SnapshotIO.isCommitted(dir, "triples", "n20_s42_v2"))
    SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("per-type report generalizes to any type column (per-predicate over triples)") {
    val r = Pipeline.run(spark, 20)
    val rep = graft.stages.Eval.perTypeReport(r.triples, r.triples,
      graft.stages.Eval.tripleKeys, typeCol = "pred").collect()
    assert(rep.length > 1) // per-predicate rows + micro total
    assert(rep.forall(_.getDouble(rep.head.fieldIndex("f1")) == 1.0)) // self vs self
    intercept[IllegalArgumentException] {
      graft.stages.Eval.perTypeReport(r.triples, r.triples,
        graft.stages.Eval.tripleKeys, typeCol = "nope")
    }
  }
}
