package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also dumps the generator's gold side-tables (synthesized transcripts,
  * gold mentions at both pipeline sizes, gold triples) under `outDir/_aux`
  * and substitutes that absolute path for the `{AUX}` token in the oracle
  * SQL — so DuckDB can cross-check the KG pipeline queries against the
  * INDEPENDENT generator output (not against the pipeline itself).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // gold aux tables, sized exactly like the queries' synthesized inputs
    val auxDir = new java.io.File(s"$outDir/_aux").getAbsolutePath
    val n = SparkEntry.convsFor(sfDir)
    val nSmall = math.max(20L, n / 10) // q34/q36 pipeline size
    import graft.synth.Transcripts
    try {
      Transcripts.turns(spark, n).toDF()
        .coalesce(4).write.mode("overwrite").parquet(s"$auxDir/turns")
      Transcripts.goldMentions(spark, n).toDF()
        .coalesce(4).write.mode("overwrite").parquet(s"$auxDir/gold_mentions")
      Transcripts.goldMentions(spark, nSmall).toDF()
        .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/gold_mentions_small")
      Transcripts.goldTriples(spark, n).toDF()
        .coalesce(4).write.mode("overwrite").parquet(s"$auxDir/gold_triples")
      // q37's TRAINED coarse quantizer: kmeansCentroids is bit-deterministic
      // (seeded hash60 init, fixed Lloyd iterations, decimal sums), so this
      // dump is exactly the matrix the q37 query trains internally — the
      // oracle re-derives assignment → probing → rerank from it in SQL.
      val cents = graft.ops.Similarity.kmeansCentroids(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        nlist = 16, dim = 64, iters = 2)
      spark.createDataFrame(cents.toSeq.zipWithIndex.map { case (v, i) => (i, v.toSeq) })
        .toDF("cid", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/ivf_centroids")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] aux dump failed: ${e.getMessage}")
    }

    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace(SparkEntry.AuxToken, auxDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
