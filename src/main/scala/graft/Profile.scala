package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.core._
import graft.stages._
import graft.synth.Transcripts

/** Stage-by-stage wall-clock profile of the KG pipeline (diagnostic main;
  * not part of the driver contract). Usage: runMain graft.Profile [nConvs] [cores]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 66000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val turns = Transcripts.turns(spark, nConvs).persist(StorageLevel.MEMORY_AND_DISK)
    t("turns")(turns.count())
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    val mentions = Detect.run(turns, tagger).persist(StorageLevel.MEMORY_AND_DISK)
    t("detect")(mentions.count())
    val linked = t("link")(
      Link.run(mentions, Transcripts.aliasRows.toDF()).persist(StorageLevel.MEMORY_AND_DISK))
    t("link.count")(linked.count())
    val canon = t("canon")(
      Canon.run(linked, Transcripts.sameAs.toDF("src", "dst")).persist(StorageLevel.MEMORY_AND_DISK))
    t("canon.count")(canon.count())
    val triples = t("triples")(Triples.run(canon))
    t("triples.count")(triples.count())
    spark.stop()
  }
}
