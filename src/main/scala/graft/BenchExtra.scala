package graft

import org.apache.spark.sql.SparkSession

/** Noop-sink isolation bench (guide §1.4): times selected declared queries
  * with `df.write.format("noop")` — every column of every row computed, no
  * sink cost, no count-path pruning — over `reps` repetitions, printing one
  * JSON line per query with all rep times and the min. Jobs are labeled via
  * setJobDescription. Diagnostic only; the driver's frozen `graft.Bench`
  * (count-based, one rep, alphabetical order) remains the graded protocol.
  *
  * Usage: runMain graft.BenchExtra [reps] [q1,q2,... | all]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val only: Set[String] =
      if (args.length > 1 && args(1) != "all") args(1).split(',').map(_.trim).toSet
      else Set.empty
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same untimed warmup duties as graft.Bench (session bring-up, codegen)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    stages.Pipeline.run(spark, 50, seed = 7L, memoize = false).triples.count()
    spark.catalog.clearCache()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        val times = (1 to reps).map { i =>
          spark.sparkContext.setJobDescription(s"$name rep $i")
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[benchextra] $name failed: ${e.getMessage}") }
          spark.sparkContext.setJobDescription(null)
          (System.nanoTime() - t0) / 1e9
        }
        val ts = times.map(t => f"$t%.3f").mkString("[", ",", "]")
        println(f"""{"metric":"noop","query":"$name","reps":$ts,"min":${times.min}%.3f}""")
      }
    }
    spark.stop()
  }
}
