package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.CanonMention

/** Skew demonstration for triple assembly: one pathological conversation
  * with `hugeTurns` turns (every turn carrying two PER mentions) mixed into
  * a normal corpus. The unchunked per-conversation window serializes the
  * whole conversation into ONE task — `hugeTurns` aggregated rows sorted
  * and lagged on a single core while the rest of the machine idles — while
  * the chunked default (`Triples.run`, chunk = 65,536 turns) spreads it
  * across `hugeTurns / 65,536` window tasks with overlap-1 boundary
  * stitching. Outputs are identical (equivalence-tested in PipelineSpec);
  * this main measures the wall-clock difference and prints ONE JSON line.
  *
  * Usage: runMain graft.SkewBench [hugeTurns] [cores]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val hugeTurns = if (args.length > 0) args(0).toLong else 2000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd")) // round-6 measured default
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(huge: Long): org.apache.spark.sql.Dataset[CanonMention] = {
      // the pathological conversation: 2 PER mentions per turn, ids cycling
      // so adjacent turns emit follows_up pairs
      val big = spark.range(huge).select(
        lit("huge").as("conv_id"), col("id").cast("int").as("turn_idx"),
        explode(array(lit(0), lit(10))).as("start"))
        .select(col("conv_id"), col("turn_idx"), col("start"),
          (col("start") + 3).as("end"), lit("PER").as("label"),
          lit("xxx").as("surface"),
          format_string("P%02d", pmod(col("turn_idx") * 7 + col("start"), lit(50)))
            .as("entity_id"))
        .withColumn("canonical_id", col("entity_id"))
      // a normal corpus of 20-turn conversations, same total mention volume
      val normal = spark.range(huge).select(
        col("id"),
        format_string("c%09d", (col("id") / 20).cast("long")).as("conv_id"),
        pmod(col("id"), lit(20)).cast("int").as("turn_idx"),
        explode(array(lit(0), lit(10))).as("start"))
        .select(col("conv_id"), col("turn_idx"), col("start"),
          (col("start") + 3).as("end"), lit("PER").as("label"),
          lit("xxx").as("surface"),
          format_string("Q%02d", pmod(col("id") * 3 + col("start"), lit(50)))
            .as("entity_id"))
        .withColumn("canonical_id", col("entity_id"))
      big.unionByName(normal).as[CanonMention]
    }

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // both corpora draw entity ids from P%02d / Q%02d, 50 values each
    val dict = stages.TripleDict(Seq("PER"),
      (0 until 50).flatMap(i => Seq(f"P$i%02d", f"Q$i%02d")))
    // JIT/codegen warmup on all paths at 1/10 scale
    stages.Triples.runWindow(corpus(hugeTurns / 10)).count()
    stages.Triples.run(corpus(hugeTurns / 10)).count()
    stages.Triples.runEncoded(corpus(hugeTurns / 10), dict).count()
    stages.Triples.runEncodedSorted(corpus(hugeTurns / 10), dict).count()
    val window = (1 to 2).map(_ => time(stages.Triples.runWindow(corpus(hugeTurns)).count())).min
    val chunked = (1 to 2).map(_ => time(stages.Triples.run(corpus(hugeTurns)).count())).min
    val encoded = (1 to 2).map(_ =>
      time(stages.Triples.runEncoded(corpus(hugeTurns), dict).count())).min
    // the sorted-exchange walker under the same skew: the huge conversation
    // hash-spreads by (key, chunk) like the others, and within a chunk the
    // 64k-turn group is one spill-safe external sort, not a collect_list
    // buffer — per-task memory O(one turn)
    val sorted = (1 to 2).map(_ =>
      time(stages.Triples.runEncodedSorted(corpus(hugeTurns), dict).count())).min
    println(f"""{"metric":"skew_triples","huge_turns":$hugeTurns,"window_sec":$window%.1f,"chunked_sec":$chunked%.1f,"encoded_sec":$encoded%.1f,"sorted_sec":$sorted%.1f,"speedup":${window / chunked}%.2f,"speedup_encoded":${window / encoded}%.2f,"speedup_sorted":${window / sorted}%.2f}""")
    spark.stop()
  }
}
