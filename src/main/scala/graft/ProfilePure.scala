package graft

import org.apache.spark.sql.SparkSession
import graft.stages._
import graft.synth.Transcripts

/** Cumulative-chain profile without persists: times each prefix of the
  * pipeline as an independent fresh action, so stage cost = delta between
  * consecutive prefixes. Diagnostic only.
  * Usage: runMain graft.ProfilePure [nConvs] [cores]
  */
object ProfilePure {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 660000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // SPARK_GRAFT_PREFIXES=gen,gen+detect,... restricts which prefixes run —
    // low-core attribution runs can't afford the full list (the generic
    // triples control alone is minutes at 1 core)
    val only: Set[String] = sys.env.get("SPARK_GRAFT_PREFIXES")
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty)
    def t(name: String)(f: => Long): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      val t0 = System.nanoTime()
      val n = f
      println(f"[pure] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      spark.catalog.clearCache()
    }

    // warmup
    Pipeline.run(spark, nConvs / 10, seed = 7L, memoize = false).triples.count()
    spark.catalog.clearCache()

    val alias = Transcripts.aliasRows.toDF()
    t("gen")(Transcripts.turns(spark, nConvs).count())
    t("gen+detect") {
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Detect.run(Transcripts.turns(spark, nConvs), tagger).count()
    }
    t("gen..link") {
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Link.run(Detect.run(Transcripts.turns(spark, nConvs), tagger), alias).count()
    }
    t("cc-only")(Canon.connectedComponents(Transcripts.sameAs.toDF("src", "dst")).count())
    t("gen..canon") {
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Canon.run(Link.run(Detect.run(Transcripts.turns(spark, nConvs), tagger), alias),
        Transcripts.sameAs.toDF("src", "dst")).count()
    }
    t("gen..triples") {
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Triples.run(Canon.run(
        Link.run(Detect.run(Transcripts.turns(spark, nConvs), tagger), alias),
        Transcripts.sameAs.toDF("src", "dst"))).count()
    }
    t("gen..triplesEnc") { // dictionary-encoded collect_list/window exchange
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Triples.runEncoded(Canon.run(
        Link.run(Detect.run(Transcripts.turns(spark, nConvs), tagger), alias),
        Transcripts.sameAs.toDF("src", "dst")), Pipeline.transcriptsDict,
        convCodec = Some(Pipeline.transcriptsConvCodec)).count()
    }
    t("gen..triplesSrt") { // sorted-exchange walker (Pipeline default r5-r6)
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Triples.runEncodedSorted(Canon.run(
        Link.run(Detect.run(Transcripts.turns(spark, nConvs), tagger), alias),
        Transcripts.sameAs.toDF("src", "dst")), Pipeline.transcriptsDict,
        convCodec = Some(Pipeline.transcriptsConvCodec)).count()
    }
    t("gen..triplesFus") { // fused detect→packed walker (Pipeline default, r7)
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Triples.runFusedDetect(Transcripts.turns(spark, nConvs), tagger,
        Transcripts.aliasRows, Transcripts.sameAs, Pipeline.transcriptsDict,
        Pipeline.transcriptsConvEncodeJvm,
        Pipeline.transcriptsConvCodec.decode).count()
    }
    spark.stop()
  }
}
