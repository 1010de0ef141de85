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
    q.processAllAvailable()
    // incremental: a second micro-batch arrives after the first completed
    src.addData(mkTurn("c2", 0, "Grace Obi flew to Lisbon", 2))
    q.processAllAvailable(); q.stop()
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
    src.addData(
      mkTurn("c1", 0, "Alice Varga met Bob Castillo", 0),   // win 10:00
      mkTurn("c1", 1, "Berlin office of Acme Corp", 2),     // win 10:00
      mkTurn("c2", 0, "Hiro Tanaka visited Osaka", 7))      // win 10:05
    q.processAllAvailable()
    src.addData(mkTurn("c3", 0, "advancing the watermark", 59))
    q.processAllAvailable()
    src.addData(mkTurn("c3", 1, "and flushing closed windows", 59))
    q.processAllAvailable(); q.stop()
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
    SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
