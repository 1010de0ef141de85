package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.stages._
import graft.synth.Transcripts

/** A/B probe for the encoded triple exchange (VERDICT r4 item 1, extended
  * r6): runs the full gen..triples chain under each exchange shape —
  *   "mention"   one shuffled row per MENTION + collect_list/window (the
  *               round-4 shape),
  *   "prepack"   one row per locally-contiguous turn run (runEncoded
  *               prePack=true),
  *   "sorted64"  sortWithinPartitions walker, 64-bit codec key + packed
  *               (chunk,turn) — the round-5 shape,
  *   "sorted32"  walker with the (convKey32|chunk|tic, mention) 2-long rows
  *               (ConvCodec.fits32 — the Pipeline default since round 6),
  *   "uuidstr"   conv ids remapped to UUID strings (numeric codec
  *               impossible), exact string-keyed sorted exchange,
  *   "uuidhash"  same UUID corpus through runEncodedSortedHashed (96-bit
  *               hash keys + once-per-run carrier strings) —
  * and reports wall plus TOTAL shuffle write bytes/records per leg via a
  * task-metrics listener. Wall alone can under-report a byte win on this
  * single-host VM (shuffle "bytes" never cross a NIC here); the
  * byte/record counts are the cluster-relevant evidence. The uuid legs are
  * only comparable to each other (their corpus ships wider ids through
  * detect/link/canon too). Diagnostic only.
  * Usage: runMain graft.ExchangeAB [nConvs] [cores] [reps] [variants-csv]
  */
object ExchangeAB {
  private final class ShuffleTally extends SparkListener {
    val writeBytes = new AtomicLong
    val writeRecords = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        writeRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 660000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 2
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.default.parallelism", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd")) // round-6 measured default
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    def chain(variant: String, convs: Long = nConvs): Long = {
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, expr}
      // "fused" (round 7, the Pipeline default): detect emits the Packed32
      // wire rows directly — no Mention Dataset, no link/canon joins. Same
      // exchange+walker as sorted32; upstream row plumbing removed.
      if (variant == "fused")
        return Triples.runFusedDetect(Transcripts.turns(spark, convs), tagger,
          Transcripts.aliasRows, Transcripts.sameAs, Pipeline.transcriptsDict,
          Pipeline.transcriptsConvEncodeJvm,
          Pipeline.transcriptsConvCodec.decode).count()
      val canon0 = Canon.run(
        Link.run(Detect.run(Transcripts.turns(spark, convs), tagger),
          Transcripts.aliasRows.toDF()),
        Transcripts.sameAs.toDF("src", "dst"))
      // uuid legs: remap every conv id to a UUID-shaped md5 (deterministic,
      // NOT numeric-derivable) right before triple assembly, so the two uuid
      // legs share identical upstream work and differ only in the exchange
      val canon = if (variant.startsWith("uuid"))
        canon0.withColumn("conv_id",
          expr("concat(substr(md5(conv_id),1,8),'-',substr(md5(conv_id),9,4),'-'," +
            "substr(md5(conv_id),13,4),'-',substr(md5(conv_id),17,4),'-'," +
            "substr(md5(conv_id),21,12))")).as[graft.core.CanonMention]
      else canon0
      val codec32 = Pipeline.transcriptsConvCodec // fits32 = true
      val codec64 = codec32.copy(fits32 = false)
      val triples = variant match {
        case "mention" => Triples.runEncoded(canon, Pipeline.transcriptsDict,
          convCodec = Some(codec32), prePack = false)
        case "prepack" => Triples.runEncoded(canon, Pipeline.transcriptsDict,
          convCodec = Some(codec32), prePack = true)
        case "sorted64" => Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
          convCodec = Some(codec64))
        case "sorted32" => Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
          convCodec = Some(codec32))
        case "uuidstr" => Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
          convCodec = None)
        case "uuidhash" => Triples.runEncodedSortedHashed(canon, Pipeline.transcriptsDict)
      }
      triples.count()
    }

    val variants =
      if (args.length > 3) args(3).split(',').toSeq
      else Seq("mention", "prepack", "sorted64", "sorted32", "fused",
        "uuidstr", "uuidhash")
    // JIT/codegen warmup on ALL variants at 1/10 scale
    variants.foreach(chain(_, nConvs / 10))
    spark.catalog.clearCache()

    for (variant <- variants; rep <- 1 to reps) {
      spark.catalog.clearCache()
      Thread.sleep(2000) // drain the async listener bus before snapshotting
      val b0 = tally.writeBytes.get(); val r0 = tally.writeRecords.get()
      val t0 = System.nanoTime()
      val triples = chain(variant)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      val bytes = tally.writeBytes.get() - b0
      val recs = tally.writeRecords.get() - r0
      println(f"""{"metric":"exchange_ab","variant":"$variant","rep":$rep,"convs":$nConvs,"triples":$triples,"sec":$sec%.2f,"shuffle_write_bytes":$bytes,"shuffle_write_records":$recs}""")
    }
    spark.stop()
  }
}
