package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * The KG pipeline itself is covered by the q21–q24 entries over the
  * synthesized transcript corpus sized for the sf dir. They share ONE
  * session-memoized `Pipeline.run` Result: the first of them to execute
  * pays the full detect→link→canon→triples flow and the rest time reads of
  * the persisted stages — so only that first query's time is a pipeline
  * measurement (per-stage walls live in `graft.ProfilePure`;
  * `graft.Scaling` produces the two-parallelism throughput/efficiency
  * evidence for BENCH.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // data-driven partition count (AQE coalesces small stages); tmpfs
      // shuffle dirs keep the measurement CPU-bound, not VM-disk-bound
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd")) // round-6 measured default
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session bring-up, codegen JIT, parquet footer reads —
    // otherwise the alphabetically-first query absorbs ~15s of one-time cost.
    // Array/struct literals land in the codegen `references` array (not the
    // generated source), so tiny-input warmups compile the SAME classes the
    // measured queries reuse.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    stages.Pipeline.run(spark, 50, seed = 7L, memoize = false).triples.count()
    val embW = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100).cache()
    ops.Similarity.ivfTopK(embW.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
      embW, 2, nlist = 4, nprobe = 2).count()
    ops.Similarity.lshTopK(embW.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
      embW, 2, planes = 4).count()
    ops.Dedup.cosineNearDupPairs(embW, threshold = 0.9, planes = 8).count()
    val docsW = spark.read.parquet(s"$sfDir/documents.parquet").limit(50).cache()
    ops.Dedup.simhashPairs(docsW, maxHamming = 16).count()
    ops.Dedup.ngramJaccardPairs(docsW, k = 1, threshold = 0.8, maxShingleDf = 600).count()
    embW.unpersist(); docsW.unpersist()
    spark.catalog.clearCache()
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failed ::= name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // failures are surfaced IN the one-line JSON (a broken query would
    // otherwise record a near-zero time and make the run look healthy+fast)
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

/** Two-parallelism scaling evidence (sandbox stand-in for N vs 4N
  * executors, per BASELINE.md): runs the identical KG pipeline job on the
  * identical synthesized input at local[8] and local[32], reports turns/sec
  * at both plus scaling efficiency = (thr_32 / thr_8) / 4.
  *
  * Usage: runMain graft.Scaling [nConvs] — writes markdown rows to stdout.
  */
/** Adversarial-scale connected components: a long-chain graph is the
  * round-count worst case for the alternating large/small-star loop
  * (each round roughly squares pointer reach, so rounds ≈ log n). Builds
  * `nChains` disjoint path graphs of `chainLen` edges each (default
  * 10 × 1M = 10M edges over 10M+10 vertices), runs the CC loop, and prints
  * ONE JSON line with rounds, wall seconds, and component count — plus a
  * hard failure if the loop exhausted maxIter (the silent-warning check).
  *
  * Usage: runMain graft.CCBench [nChains] [chainLen] [cores]
  */
object CCBench {
  def main(args: Array[String]): Unit = {
    val nChains = if (args.length > 0) args(0).toInt else 10
    val chainLen = if (args.length > 1) args(1).toLong else 1000000L
    val cores = if (args.length > 2) args(2).toInt else 32
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
    import org.apache.spark.sql.functions._
    val nEdges = nChains * chainLen
    // chain c owns vertex ids [c*(chainLen+1), (c+1)*(chainLen+1));
    // edge i inside chain c links consecutive vertices — zero-padded string
    // ids so lexicographic comparisons equal numeric order
    val edges = spark.range(nEdges).select(
      (col("id") / chainLen).cast("long").as("c"),
      pmod(col("id"), lit(chainLen)).as("i"))
      .select(
        format_string("v%09d", col("c") * (chainLen + 1) + col("i")).as("src"),
        format_string("v%09d", col("c") * (chainLen + 1) + col("i") + 1).as("dst"))
    // tiny warmup so codegen/JIT isn't billed to the measured run —
    // maxLocalEdges = 0 keeps the warmup on the DISTRIBUTED loop (the path
    // the measured run takes), not the small-graph driver fast path
    stages.Canon.connectedComponents(edges.limit(1000), maxLocalEdges = 0).count()
    val t0 = System.nanoTime()
    // maxLocalEdges = 0: CCBench is the STAR-LOOP evidence — without the
    // pin, any ≤4M-edge config would silently measure the driver union-find
    // fast path and report rounds=0
    val (comp, rounds, converged) =
      stages.Canon.connectedComponentsWithStats(edges, maxLocalEdges = 0)
    val nComponents = comp.select("canonical_id").distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"cc_chain","edges":$nEdges,"chains":$nChains,"rounds":$rounds,"converged":$converged,"components":$nComponents,"sec":$sec%.1f}""")
    spark.stop()
    if (!converged || nComponents != nChains) sys.exit(1)
  }
}

object Scaling {
  def run(cores: Int, nConvs: Long, repeats: Int = 2): (Long, Double) = {
    new java.io.File("/dev/shm/graft-spark").mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      // partition count is DATA-driven, identical at both parallelism levels
      // (only cores change), so legs stay comparable; env-tunable for A/B.
      // 128 was sized for round-1 row widths; the round-6 sorted32+zstd
      // exchange is ~152 MB total at the bench corpus, so far smaller
      // counts are spill-free too — BENCH.md records the measured choice.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", "128"))
      .config("spark.default.parallelism",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", "128"))
      // shuffle files on tmpfs: the sandbox VM's disk throttles ~300MB/s,
      // which caps the high-core leg on I/O instead of CPU (a real cluster
      // node's NVMe wouldn't); we measure CPU scaling, not VM disk
      .config("spark.local.dir", "/dev/shm/graft-spark")
      // shuffle/checkpoint codec, env-tunable for A/B. Default flipped to
      // zstd in round 6 on same-session A/B evidence at the sorted32 row
      // shape: −61% compressed exchange bytes AND ≤ wall at every core
      // count (32c chain 8.99 vs 10.78 s best; 4c leg 579.3k vs 559.2k
      // turns/s; 1c within noise; 1→4 efficiency 0.914 — BENCH.md
      // §Round-6). On a NIC-bound cluster the byte cut compounds.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup at 1/10 scale so the first-measured leg isn't
    // penalized for compiling the whole-stage-codegen classes
    stages.Pipeline.run(spark, math.max(20L, nConvs / 10), seed = 7L,
      memoize = false).triples.count()
    val nTurns = synth.Transcripts.turns(spark, nConvs).count() // corpus size
    val best = (1 to repeats).map { i =>
      val t0 = System.nanoTime()
      // memoize=false: every rep must pay the full pipeline (incl. the CC
      // loop) — sharing a memoized Result across reps would time a cache
      val r = stages.Pipeline.run(spark, nConvs, memoize = false)
      val nTriples = r.triples.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop this rep's persisted stages (incl. Link's internal cache)
      System.err.println(s"[scaling] cores=$cores rep=$i turns=$nTurns triples=$nTriples sec=$sec")
      sec
    }.min
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (nTurns, nTurns / best)
  }

  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 66000L
    val lo = if (args.length > 1) args(1).toInt else 8
    val hi = if (args.length > 2) args(2).toInt else lo * 4
    val (nTurns, thrLow) = run(lo, nConvs)
    val (_, thrHigh) = run(hi, nConvs)
    val eff = (thrHigh / thrLow) / (hi.toDouble / lo)
    println(f"""{"metric":"scaling","turns":$nTurns,"cores_low":$lo,"cores_high":$hi,"turns_per_sec_low":$thrLow%.1f,"turns_per_sec_high":$thrHigh%.1f,"efficiency":$eff%.3f}""")
  }
}
