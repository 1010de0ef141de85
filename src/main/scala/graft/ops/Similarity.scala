package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.synth.Transcripts.mix

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact; broadcast the query set, never
  * the corpus). Scale path: sign-random-projection LSH buckets (deterministic
  * hyperplanes derived from splitmix64 — reproducible across runs/executors
  * with no RNG state) so candidate generation touches only same-bucket rows;
  * multi-probe widens recall.
  *
  * All vector math routes through the native codegen'd `FloatVecDot`
  * Catalyst expression (functions/VectorExpressions.scala) — the HOF
  * `aggregate(zip_with(...))` formulation is interpreted (~20µs/eval at
  * dim=64) and is kept only as `dotHof` for the parity test.
  */
object Similarity {
  import graft.functions.VectorExpressions.vec_dot

  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** cosine = a·b / (max(|a|, ε) max(|b|, ε)) — three codegen'd dots, no
    * HOFs. BOTH norms are ε-guarded: a zero-norm vector on either side
    * yields 0/ε = 0, never 0/0 = NaN — and Spark sorts NaN GREATER than
    * every number, so an unguarded NaN row would pass every `>= threshold`
    * filter and rank FIRST in every top-k window (k arbitrary "nearest"
    * neighbors for a zero embedding instead of none). Mirrored exactly in
    * the DuckDB oracle SQL (SparkEntry.cosineSql).
    */
  def cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (greatest(sqrt(vec_dot(a, a)), lit(1e-12)) *
      greatest(sqrt(vec_dot(b, b)), lit(1e-12)))

  /** Interpreted higher-order-function dot — reference implementation for
    * VectorExprSpec parity only; do not use on hot paths.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Deterministic hyperplane matrix [planes][dim] from splitmix64. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 7L): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      // uniform in [-1, 1) from the mixed bits
      (mix(seed ^ (p.toLong << 32) ^ d.toLong).toDouble / Long.MaxValue.toDouble)
    }

  /** Sign-LSH bucket id: bit p = (v · plane_p) >= 0. Each plane dot is the
    * native codegen'd expression (float vector × double literal plane).
    */
  def signBucket(v: Column, planes: Int, dim: Int, seed: Long = 7L): Column = {
    val hp = hyperplanes(planes, dim, seed)
    (0 until planes).map { p =>
      val d = vec_dot(v, typedLit(hp(p).toSeq))
      when(d >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def withSignBucket(emb: DataFrame, planes: Int, dim: Int): DataFrame =
    emb.withColumn("bucket", signBucket(col("embedding"), planes, dim))

  /** Exact brute-force top-k neighbors for each query row.
    * The query side is expected to be small (it is broadcast); the corpus
    * side streams. Output: (query_id, neighbor_id, rank) — ids only, so the
    * result is FP-robust for cross-engine checks.
    *
    * @param minScore reference threshold-p semantics
    *        (`label_counter.py:56-68`): only neighbors with cosine ≥ p are
    *        ranked at all; ranks stay dense among survivors. Negative = off.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     minScore: Double = -1.0): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .filter(col("cos") >= minScore)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Seeded Lloyd's k-means coarse quantizer, DataFrame-native: the corpus
    * never leaves the cluster — each iteration is ONE distributed job
    * (assign cells via `nlist` codegen'd dots, then 64 per-dimension sums),
    * and only the `nlist × dim` centroid matrix is collected per iteration.
    *
    * Determinism: init picks the `nlist` vectors with the smallest
    * `hash60("<vec_id>:<seed>")` (md5-derived — reproducible on any
    * partitioning AND engine-portable, so the untrained quantizer is
    * DuckDB-oracle-checkable); iteration count is fixed (no convergence
    * probe); per-cell sums accumulate in DECIMAL(38,18), which is exact and
    * order-independent — so the TRAINED centroids are also bit-identical
    * across runs and partitionings (a plain double sum varies at ~1e-13
    * with shuffle-merge order). That bit-determinism is what lets
    * `graft.Verify` dump the trained matrix as the `{AUX}/ivf_centroids`
    * table and the q37 oracle re-derive assignment → probing → rerank from
    * it in DuckDB.
    */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, dim: Int = 64,
                      iters: Int = 3, seed: Long = 7L,
                      maxExprCells: Int = MaxExprCells): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = corpus
      .select(col("vec_id"), col("embedding"))
      .withColumn("_h", TextAnalysis.hash60(
        concat_ws(":", col("vec_id").cast("string"), lit(seed.toString))))
      .orderBy(col("_h"), col("vec_id")).limit(nlist)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)

    for (_ <- 1 to iters) {
      // each iteration's centroid matrix is new; the loop-path broadcast is
      // destroyed right after the iteration's one action completes (no
      // accumulation of dead broadcast blocks over Lloyd iterations)
      val bcIter =
        if (cents.length <= maxExprCells) None
        else Some(corpus.sparkSession.sparkContext.broadcast(cents))
      val cell = bcIter.map(cellArgmaxLoop)
        .getOrElse((v: Column) => cellArgmaxExpr(v, cents))(col("embedding"))
      // decimal(38,18) sums: exact + commutative → deterministic centroids
      // (embedding components are O(1) floats; 20 integer digits of headroom
      // hold ~1e19 rows per cell before overflow could null a sum)
      val aggs = count(lit(1)).as("n") +:
        (0 until dim).map(d =>
          sum(col("embedding").getItem(d).cast("decimal(38,18)")).as(s"s$d"))
      val stats = corpus.select(col("embedding"), cell.as("cell"))
        .groupBy(col("cell")).agg(aggs.head, aggs.tail: _*)
        .collect()
      bcIter.foreach(_.destroy())
      val next = cents.map(_.clone()) // empty cells keep their old centroid
      stats.foreach { r =>
        val c = r.getInt(0); val n = r.getLong(1).toDouble
        next(c) = Array.tabulate(dim)(d => r.getDecimal(2 + d).doubleValue() / n)
      }
      cents = next
    }
    cents
  }

  /** Parameter envelope for the expression-based cell assignment: each cell
    * adds one `vec_dot` + struct to ONE projection, so the expression tree
    * (and its codegen'd method) grows linearly with `nlist` — measured fine
    * through a few hundred cells, but at nlist ≫ 512 the tree itself
    * becomes the bottleneck (planning time + codegen method-size limits
    * force interpreted fallback). Above this threshold cell assignment
    * switches to `cellArgmaxLoop`: a plain JIT'd argmax loop over a
    * broadcast centroid matrix — O(1) expression size at any nlist, same
    * result (equivalence-tested, including tie-breaks).
    */
  val MaxExprCells = 512

  /** argmax over centroid dots (native codegen'd float×double dot),
    * deterministic tie-break on the lower cell index. Expression path —
    * see `MaxExprCells` for the envelope.
    */
  private[graft] def cellArgmaxExpr(v: Column, cents: Array[Array[Double]]): Column = {
    require(cents.nonEmpty, "cell assignment needs at least one centroid")
    if (cents.length == 1) lit(0) // greatest() requires ≥ 2 arguments
    else greatest(cents.zipWithIndex.map { case (cv, i) =>
      // negate the index inside the struct comparison so equal scores pick
      // the SMALLEST index (struct greatest compares fields left-to-right)
      struct(vec_dot(v, typedLit(cv.toSeq)).as("s"), lit(-i).as("negi"))
    }: _*).getField("negi") * lit(-1)
  }

  /** Loop path for nlist > MaxExprCells: one UDF over a BROADCAST centroid
    * matrix (task closures would re-ship the matrix per task; at
    * nlist=65536 × dim=64 that is ~32 MB). Strict `>` keeps the first
    * (smallest) index on ties — identical to the expression tie-break.
    * Takes the broadcast handle so one handle serves every consumer in a
    * plan (caller owns the lifecycle; destroy only after the last action).
    */
  private[graft] def cellArgmaxLoop(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column => Column = {
    val f = udf((emb: Seq[Float]) => {
      val cs = bc.value
      var best = 0; var bestS = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        // common-prefix dot on ragged inputs — FloatVecDot's documented
        // semantics, so both envelope paths agree
        val len = math.min(emb.length, c.length)
        var s = 0.0; var d = 0
        while (d < len) { s += emb(d) * c(d); d += 1 }
        // Double.compare ordering (NaN greatest) — identical to the SQL
        // struct comparison in the expression path; ties keep the first
        // (smallest) index
        if (java.lang.Double.compare(s, bestS) > 0) { bestS = s; best = i }
        i += 1
      }
      best
    })
    v => f(v)
  }

  /** IVF ANN top-k with a trained (seeded, fixed-iteration Lloyd) coarse
    * quantizer: every corpus vector is assigned to its nearest centroid
    * (cell), each query probes its `nprobe` nearest cells only, exact
    * cosine reranks inside the probed cells. Cost scales with
    * corpus/nlist × nprobe instead of corpus².
    *
    * @param minScore reference threshold-p (`label_counter.py:56-68`);
    *        negative = off.
    * @param kmeansIters 0 falls back to raw seeded-init centroids (no
    *        training jobs) — useful for plan tests.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 2, dim: Int = 64,
              kmeansIters: Int = 2, minScore: Double = -1.0,
              maxExprCells: Int = MaxExprCells): DataFrame = {
    // nprobe = 0 would fail asymmetrically across the envelope: the
    // expression path's slice(..., 1, 0) yields silently-empty results while
    // the loop path's top-nprobe UDF indexes ts(-1) — fail eagerly instead
    require(nprobe > 0, s"nprobe must be ≥ 1, got $nprobe")
    val cents = kmeansCentroids(corpus, nlist, dim, kmeansIters,
      maxExprCells = maxExprCells)
    // the envelope is keyed on cents.length EVERYWHERE (assignment, probing,
    // and training above): with corpus cardinality < nlist the trained
    // matrix can be smaller than nlist, and a mixed keying would send the
    // two halves of one query down different paths. ONE broadcast handle
    // serves both loop-path consumers; it lives as long as the returned
    // plan (the ContextCleaner reclaims it when the plan is GC'd).
    val loopBc =
      if (cents.length <= maxExprCells) None
      else Some(corpus.sparkSession.sparkContext.broadcast(cents))
    def assigner(v: Column): Column = loopBc match {
      case Some(bc) => cellArgmaxLoop(bc)(v)
      case None     => cellArgmaxExpr(v, cents)
    }

    val cellCorpus = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), assigner(col("embedding")).as("cell"))

    // query → nprobe nearest cells: explode the per-query top-nprobe cells.
    // Same envelope as cell assignment (see MaxExprCells): the expression
    // path builds a cents.length-wide struct array in one projection; above
    // the threshold the shared broadcast-matrix UDF returns the probe list.
    val qProbes = (loopBc match {
      case None =>
        val centLit = cents.zipWithIndex.map { case (v, i) => (i, typedLit(v.toSeq)) }
        queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          explode(slice(sort_array(array(centLit.map { case (cid, cv) =>
            struct(vec_dot(col("embedding"), cv).as("s"), lit(cid).as("cid"))
          }: _*), asc = false), 1, nprobe)).as("probe"))
          .select(col("query_id"), col("qv"), col("probe.cid").as("cell"))
      case Some(bc) =>
        // bounded top-nprobe selection (no full nlist-sized sort or boxed
        // tuples per row). Ordering matches the expression path's
        // sort_array(desc) over struct(s, cid) EXACTLY: scores desc under
        // Double.compare (NaN greatest), ties → larger cid first.
        val topCells = udf((emb: Seq[Float]) => {
          val cs = bc.value
          val kSel = math.min(nprobe, cs.length)
          val ts = new Array[Double](kSel)
          val ti = new Array[Int](kSel)
          var filled = 0
          def better(s1: Double, i1: Int, s2: Double, i2: Int): Boolean = {
            val c = java.lang.Double.compare(s1, s2)
            c > 0 || (c == 0 && i1 > i2)
          }
          var i = 0
          while (i < cs.length) {
            val c = cs(i)
            val len = math.min(emb.length, c.length) // common-prefix dot
            var s = 0.0; var d = 0
            while (d < len) { s += emb(d) * c(d); d += 1 }
            if (filled < kSel || better(s, i, ts(filled - 1), ti(filled - 1))) {
              var p = if (filled < kSel) { filled += 1; filled - 1 } else kSel - 1
              ts(p) = s; ti(p) = i
              while (p > 0 && better(ts(p), ti(p), ts(p - 1), ti(p - 1))) {
                val s0 = ts(p - 1); val i0 = ti(p - 1)
                ts(p - 1) = ts(p); ti(p - 1) = ti(p); ts(p) = s0; ti(p) = i0
                p -= 1
              }
            }
            i += 1
          }
          (0 until filled).map(ti(_))
        })
        queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          explode(topCells(col("embedding"))).as("cell"))
    })

    val scored = cellCorpus.join(broadcast(qProbes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .filter(col("cos") >= minScore)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cos"))
  }

  /** LSH-bucketed ANN top-k: candidates = same-bucket rows (single-probe;
    * union extra probe buckets for recall), exact cosine rerank inside the
    * bucket. At 100TB the bucket join replaces the cross join — cost scales
    * with bucket occupancy, not corpus size².
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Int = 6, dim: Int = 64): DataFrame = {
    val q = withSignBucket(
      queries.select(col("vec_id").as("query_id"), col("embedding")),
      planes, dim)
      .withColumnRenamed("embedding", "qv")
    val c = withSignBucket(corpus, planes, dim)
      .select(col("bucket"), col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cos"))
  }
}
