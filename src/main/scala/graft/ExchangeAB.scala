package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.stages._
import graft.synth.Transcripts

/** A/B/C probe for the encoded triple exchange (VERDICT r4 item 1): runs
  * the full gen..triplesEnc chain under each exchange shape —
  *   "mention"  one shuffled row per MENTION + collect_list/window (the
  *              round-4 shape),
  *   "prepack"  one row per locally-contiguous turn run (runEncoded
  *              prePack=true),
  *   "sorted"   one row per mention consumed by the sortWithinPartitions
  *              walker, no collect_list/window (runEncodedSorted — measured
  *              fastest, the Pipeline default since round 5) —
  * and reports wall plus TOTAL shuffle write bytes/records per leg via a
  * task-metrics listener. Wall alone can under-report a byte win on this
  * single-host VM (shuffle "bytes" never cross a NIC here); the
  * byte/record counts are the cluster-relevant evidence. Diagnostic only.
  * Usage: runMain graft.ExchangeAB [nConvs] [cores] [reps]
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
      val canon = Canon.run(
        Link.run(Detect.run(Transcripts.turns(spark, convs), tagger),
          Transcripts.aliasRows.toDF()),
        Transcripts.sameAs.toDF("src", "dst"))
      val codec = Some(Pipeline.transcriptsConvCodec)
      val triples = variant match {
        case "mention" => Triples.runEncoded(canon, Pipeline.transcriptsDict,
          convCodec = codec, prePack = false)
        case "prepack" => Triples.runEncoded(canon, Pipeline.transcriptsDict,
          convCodec = codec, prePack = true)
        case "sorted" => Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
          convCodec = codec)
      }
      triples.count()
    }

    val variants = Seq("mention", "prepack", "sorted")
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
