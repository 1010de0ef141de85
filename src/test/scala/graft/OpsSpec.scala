package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Dedup / similarity / text-analysis / multimodal operator specs on
  * planted fixtures (deterministic, no external data).
  */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup
    (3L, "completely different content about spark shuffle partitions and joins"),
    (4L, "THE  Quick Brown fox jumps over the lazy dog near the river bank today") // case/ws dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps min doc_id per normalized fingerprint") {
    val kept = Dedup.exact(docs).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 2L, 3L))
  }

  test("exact groups report copies") {
    val g = Dedup.exactGroups(docs).collect()
    assert(g.length == 1 && g(0).getAs[Long]("n_copies") == 3 && g(0).getAs[Long]("keep_id") == 0)
  }

  test("ngram jaccard finds near-dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs.filter(col("doc_id").isin(0, 2, 3)),
        k = 3, threshold = 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 2L)))
  }

  test("hot shingle above the df cap creates no pairs; rare near-dups survive it") {
    // 6 docs sharing FOUR hot shingles (df = 6 > cap): without the cap every
    // hot pair scores jaccard 4/6 ≈ 0.67 ≥ 0.3, so the exact-equality assert
    // below FAILS if the upper df bound is ever dropped — the cap, not the
    // threshold, is what excludes them. The rare pair (10, 11) (shared-
    // shingle df = 2, jaccard 3/5 = 0.6) must survive: an over-aggressive
    // prefilter that also kills real pairs fails the same assert.
    import spark.implicits._
    val hot = (0L to 5L).map(i => (i, s"c1 c2 c3 c4 c5 c6 unique$i"))
    val near = Seq((10L, "x1 x2 x3 x4 x5 x6"), (11L, "x1 x2 x3 x4 x5 y"))
    val docs2 = (hot ++ near).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs2, k = 3, threshold = 0.3,
      maxShingleDf = 4)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((10L, 11L, 0.6)), s"got: ${got.toSeq}")
    // and the pre-filter is in the plan: the aggregation that builds the
    // posting list sits above a left-semi join on the shingle key
    val p = pairs.queryExecution.optimizedPlan.toString
    assert(p.contains("LeftSemi"), s"expected df-prefilter semi join:\n$p")
  }

  test("minhash LSH candidates include the near-dup pair") {
    val pairs = Dedup.minhashLshPairs(docs.filter(col("doc_id").isin(0, 2, 3)),
        k = 3, maxDist = 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 2L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("native minhash60 LSH finds the near-dup pair, not unrelated docs") {
    val pairs = Dedup.minhash60Pairs(docs.filter(col("doc_id").isin(0, 2, 3)),
        k = 3, numPerms = 8, rowsPerBand = 2, threshold = 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 2L)))
    // exact duplicates share every band → candidate + jaccard 1.0
    val dup = Dedup.minhash60Pairs(docs.filter(col("doc_id").isin(0, 1)),
      k = 3, threshold = 0.99).collect()
    assert(dup.length == 1 && dup.head.getDouble(2) == 1.0)
  }

  test("minhash60 band join shuffles ids only — no shingle arrays in its exchange") {
    // disable auto-broadcast (tiny fixture must plan the same shuffle joins
    // a web-scale corpus would) and AQE (so executedPlan exposes the
    // EnsureRequirements-inserted ShuffleExchangeExec nodes directly)
    val savedBr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Dedup.minhash60Pairs(docs, k = 3, threshold = 0.4)
      // every exchange partitioned on the band key must carry only
      // (band, key, doc_id) — the shingle arrays join back AFTER candidate
      // selection, so the wide columns never ride the LSH shuffle
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      val bandExs = exchanges.filter(_.outputPartitioning.toString.contains("band"))
      assert(bandExs.nonEmpty,
        s"expected a shuffle on the band key; exchanges=${exchanges.map(_.outputPartitioning)}")
      bandExs.foreach { e =>
        assert(!e.output.exists(a => a.name == "shingles" || a.name == "sa" || a.name == "sb"),
          s"band exchange must not carry shingle arrays: ${e.output.map(_.name)}")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBr)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("minhash60 shingle relation is materialized once (checkpointed), not re-derived per consumer") {
    val df = Dedup.minhash60Pairs(docs, k = 3, threshold = 0.4)
    // the shingle flatMap feeds signatures + two join-back sides; an eager
    // localCheckpoint turns all three consumers into scans of the SAME
    // materialized RDD — the plan must show checkpoint scans and contain no
    // surviving MapPartitions/DeserializeToObject lineage for the shingles
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"expected checkpointed shingle scans in:\n$p")
    assert(!p.contains("MapPartitions"),
      s"shingle flatMap lineage must not survive into the pair plan:\n$p")
  }

  test("ngram-jaccard shingle relation is materialized once (checkpointed), not re-derived per consumer") {
    val df = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5)
    // sh feeds the df-count agg AND the semi-join side with DIFFERENT
    // exchanges (partial-agg rows vs raw rows), so ReuseExchange cannot
    // dedup them — the eager localCheckpoint must make both consumers scans
    // of the same materialized RDD. Exactly ONE typed flatMap lineage may
    // remain: the posting-list pair emitter; the SHINGLE flatMap re-running
    // per consumer would show as a second (and third) one.
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"expected checkpointed shingle scans in:\n$p")
    val lineages = "DeserializeToObject".r.findAllIn(p).length
    assert(lineages == 1,
      s"expected exactly the pair-emitter lineage, found $lineages in:\n$p")
  }

  test("simhash: identical docs get identical sketches; near-dups low hamming") {
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    val hamNear = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hamFar = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(hamNear < hamFar, s"near=$hamNear far=$hamFar")
  }

  test("cosine near-dup pairs find planted duplicate vector") {
    val base = (0 until 64).map(i => math.sin(i + 1).toFloat).toArray
    val dup = base.map(x => x * 1.001f)
    val other = (0 until 64).map(i => math.cos(3 * i + 2).toFloat).toArray
    val emb = Seq((0L, base), (1L, dup), (2L, other)).toDF("vec_id", "embedding")
    val pairs = Dedup.cosineNearDupPairs(emb, threshold = 0.99, planes = 4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((0L, 1L)))
  }
}

class DedupEdgeSpec extends SparkSpecBase {
  import spark.implicits._

  test("blank docs produce EMPTY shingle arrays (no shared empty-gram mega-bucket)") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one two three")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty && sh(2L).isEmpty, s"blank docs must shingle to []: $sh")
    assert(sh(3L) == Seq("one two three"))
    // the spark.ml path's size>0 guard now actually excludes blank docs:
    // two blank docs must NOT pair with each other
    val pairs = Dedup.minhashLshPairs(docs, k = 3).collect()
    assert(!pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "blank docs paired via the empty gram")
  }

  test("degenerate docs: null text never crashes, blank docs never simhash-pair") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, "  "),
      (4L, "one two three four five"), (5L, "one two three four five six"))
      .toDF("doc_id", "text")
    // typed paths must tolerate the null row AND still find the planted
    // near-dup (jaccard(4,5) = 3/4) — a positive control, so an over-broad
    // null filter that drops everything cannot pass vacuously
    assert(Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((4L, 5L)))
    assert(Dedup.minhash60Pairs(docs, k = 3, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((4L, 5L)))
    assert(Dedup.simhash(docs).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(2L, 3L, 4L, 5L)) // null dropped; blanks still sketch (to 0)
    // blanks all sketch to 0 — they must NOT flood the pair output
    val sp = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!sp.contains((2L, 3L)), s"blank docs paired: ${sp.toSeq}")
  }

  test("zero-norm embeddings score cosine 0, never NaN-rank first") {
    val emb = Seq(
      (0L, Array.fill(4)(0f)), // zero vector
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    // a zero-norm query must rank TRUE neighbors of other queries unharmed
    // and, with a positive score floor, rank nothing itself
    val ranked = Similarity.bruteForceTopK(
      emb.filter(col("vec_id").isin(0L, 1L)), emb, k = 2, minScore = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(!ranked.exists(_._1 == 0L), s"zero-norm query ranked: ${ranked.toSeq}")
    assert(ranked.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq == Seq(2L),
      s"true neighbor ranking disturbed: ${ranked.toSeq}")
    // near-dup pairs: the zero vector shares a sign bucket with others but
    // must emit no NaN pair
    val nd = Dedup.cosineNearDupPairs(emb, threshold = 0.9, planes = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.toSet == Set((1L, 2L)), s"got: ${nd.toSeq}")
  }
}

class PromptSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.ops.Prompt

  test("tag2prompt matches the reference docstring example (tag_convert.py:23-61)") {
    val rules = Map("position" -> "职位")
    val p = Prompt.tagPrompt(Seq("B-position", "I-position"), "教师", rules).get
    assert(p.prompt == Seq("教", "师", "是", "一", "个", "[MASK]", "[MASK]", ","))
    assert(p.mask == Seq(1, 1, 1, 1, 1, 0, 0, 1))
    assert(p.tags == Seq("B-position", "I-position", "O", "O", "O", "O", "O", "O"))
    assert(p.origin == Seq("教", "师", "是", "一", "个", "职", "位", ","))
    // unknown tag type → skipped (not_found_action branch)
    assert(Prompt.tagPrompt(Seq("B-x", "E-x"), "ab", rules).isEmpty)
    // length mismatch → the reference's ValueError
    intercept[IllegalArgumentException] {
      Prompt.tagPrompt(Seq("B-position"), "教师", rules)
    }
    val w = Prompt.wordPrompt("教师")
    assert(w.prompt == Seq("教", "师", "是", "一", "个", "单", "词", ","))
    assert(w.mask.forall(_ == 1) && w.tags.forall(_ == "O") && w.origin == w.prompt)
  }

  test("entityPrompts dedups per turn on origin and skips single chars") {
    val mentions = Seq(
      ("c1", 0, 0, 5, "ORG", "Acme"),
      ("c1", 0, 9, 13, "ORG", "Acme"), // same surface twice in one turn → 1 prompt
      ("c1", 0, 20, 21, "LOC", "X"),   // single char → skipped
      ("c1", 1, 0, 4, "ORG", "Acme")   // other turn → its own prompt
    ).toDF("conv_id", "turn_idx", "start", "end", "label", "surface")
    val got = Prompt.entityPrompts(mentions, SparkEntry.PromptRules).collect()
    assert(got.length == 2)
    val row = got.find(_.getInt(1) == 0).get
    assert(row.getString(2) == "Acme是一个机构,")
    assert(row.getString(3) == "Acme是一个[MASK][MASK],")
    assert(row.getString(4) == "1,1,1,1,1,1,1,0,0,1")
    assert(row.getString(5) == "B-ORG,I-ORG,I-ORG,E-ORG,O,O,O,O,O,O")
  }

  test("matchedWordPrompts skips O-headed and single-char words (lex_loader.py:179-199)") {
    val tagged = Seq(
      ("Berlin", Seq("B-LOC", "I-LOC", "I-LOC", "I-LOC", "I-LOC", "E-LOC")),
      ("the", Seq("O", "O", "O")),
      ("x", Seq("S-LOC"))).toDF("word", "tags")
    val got = Prompt.matchedWordPrompts(tagged, SparkEntry.PromptRules).collect()
    assert(got.length == 1 && got.head.getString(0) == "Berlin")
    assert(got.head.getString(1) == "Berlin是一个地点,")
  }
}

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.ops.Sampling

  private lazy val rows = (0 until 1000).map(i => (i.toLong, s"doc $i")).toDF("id", "text")

  test("seededShuffle: identical global order regardless of partitioning") {
    val a = Sampling.seededShuffle(rows.repartition(7), Seq("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    val b = Sampling.seededShuffle(rows.repartition(3), Seq("id"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a != a.sorted, "shuffle left the input in key order") // actually shuffled
    assert(a.sorted == (0L until 1000L))
  }

  test("seededSplit: disjoint, exhaustive, ~proportional, partition-stable") {
    val Seq(tr, te) = Sampling.seededSplit(rows, Seq("id"), Seq(0.8, 0.2))
    val nTr = tr.count(); val nTe = te.count()
    assert(nTr + nTe == 1000)
    assert(tr.join(te, Seq("id"), "inner").count() == 0)
    assert(nTr > 700 && nTr < 900, s"train split $nTr")
    // membership survives repartitioning (randomSplit would NOT)
    val Seq(tr2, _) = Sampling.seededSplit(rows.repartition(13), Seq("id"), Seq(0.8, 0.2))
    assert(tr2.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      tr.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("seededSample: deterministic membership, ~fraction") {
    val s1 = Sampling.seededSample(rows, Seq("id"), 0.1)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Sampling.seededSample(rows.repartition(5), Seq("id"), 0.1)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2)
    assert(s1.size > 50 && s1.size < 170, s"sample size ${s1.size}")
  }
}

class MetricsCsvSpec extends SparkSpecBase {
  test("CSV metrics sink round-trips the lineage table (reference CSV shape)") {
    import graft.io.SnapshotIO
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    graft.stages.Pipeline.runWithSnapshots(spark, 20, dir).count()
    val m = SnapshotIO.metrics(spark, dir)
    SnapshotIO.writeMetricsCsv(m, s"$dir/metrics_csv")
    val back = spark.read.option("header", "true").csv(s"$dir/metrics_csv")
    assert(back.columns.toSeq == m.columns.toSeq)
    assert(back.count() == m.count())
    SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val v = Array.fill(64)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x * x).sum).toFloat
    v.map(_ / n)
  }

  test("brute-force top-k returns the true nearest neighbors") {
    val vs = (0 until 50).map(i => (i.toLong, vec(i)))
    val emb = vs.toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(emb.filter($"vec_id" === 0), emb, 5)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    // independent truth: compute cosines in plain Scala
    val q = vs(0)._2
    def cos(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val truth = vs.drop(1).map { case (id, v) => id -> cos(q, v) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(topk.sortBy(_._2).map(_._1).toSeq == truth.toSeq)
  }

  test("LSH top-k: cosines sane and rank-ordered descending per query") {
    val vs = (0 until 200).map(i => (i.toLong, vec(i)))
    val emb = vs.toDF("vec_id", "embedding")
    val res = Similarity.lshTopK(emb.filter($"vec_id" < 3), emb, 3, planes = 3)
    val rows = res.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, n, rank, cos) =>
      rank >= 1 && rank <= 3 && n != q && cos >= -1.0001 && cos <= 1.0001
    }, rows.toSeq.toString)
    // within each query, rank order == cosine descending (a sign-flipped
    // bucket or broken rerank would surface as an inversion here)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q cosines not descending by rank: ${rs.toSeq}")
    }
  }

  test("IVF top-k: probed-cell recall overlaps brute force, ranks bounded") {
    val vs = (0 until 200).map(i => (i.toLong, vec(i)))
    val emb = vs.toDF("vec_id", "embedding")
    val ivf = Similarity.ivfTopK(emb.filter($"vec_id" < 5), emb, 3,
      nlist = 8, nprobe = 3).collect()
    assert(ivf.nonEmpty && ivf.forall(_.getInt(2) <= 3))
    // determinism
    val ivf2 = Similarity.ivfTopK(emb.filter($"vec_id" < 5), emb, 3,
      nlist = 8, nprobe = 3).collect()
    assert(ivf.map(_.toString).toSeq == ivf2.map(_.toString).toSeq)
    // sanity: with nprobe = nlist (exhaustive probing) IVF == brute force
    val full = Similarity.ivfTopK(emb.filter($"vec_id" < 5), emb, 3,
      nlist = 8, nprobe = 8).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val bf = Similarity.bruteForceTopK(emb.filter($"vec_id" < 5), emb, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(full.toSet == bf.toSet)
  }

  test("IVF nlist envelope: loop path (nlist > maxExprCells) ≡ expression path, incl. ties") {
    val vs = (0 until 200).map(i => (i.toLong, vec(i)))
    val emb = vs.toDF("vec_id", "embedding")
    val expr = Similarity.ivfTopK(emb.filter($"vec_id" < 5), emb, 3,
      nlist = 8, nprobe = 3).collect().map(_.toString).sorted.toSeq
    // force the broadcast-matrix UDF path for BOTH cell assignment and
    // query probing — must be row-identical to the expression path
    val loop = Similarity.ivfTopK(emb.filter($"vec_id" < 5), emb, 3,
      nlist = 8, nprobe = 3, maxExprCells = 0).collect().map(_.toString).sorted.toSeq
    assert(expr == loop, s"nlist-envelope paths diverged:\n$expr\nvs\n$loop")
    // duplicate centroids: both paths must tie-break to the SMALLEST cell
    val cents = Array(Array.fill(4)(1.0), Array.fill(4)(1.0), Array.fill(4)(-1.0))
    val one = Seq((1L, Array.fill(4)(0.5f))).toDF("vec_id", "embedding")
    assert(one.select(Similarity.cellArgmaxExpr($"embedding", cents)).head.getInt(0) == 0)
    val bc = spark.sparkContext.broadcast(cents)
    try assert(one.select(Similarity.cellArgmaxLoop(bc)($"embedding")).head.getInt(0) == 0)
    finally bc.destroy()
    // single-centroid envelope: greatest() needs ≥2 args — must not throw
    val oneCent = Array(Array.fill(4)(1.0))
    assert(one.select(Similarity.cellArgmaxExpr($"embedding", oneCent)).head.getInt(0) == 0)
  }

  test("trained (k-means) IVF quantizer: recall@3 ≥ 0.9 at nprobe=4 on clustered data") {
    // IVF's contract is clusterABLE data; i.i.d. gaussian vectors are its
    // adversarial case (neighbors spread uniformly over cells — recall there
    // is ≈ nprobe/nlist by construction, tested as monotonicity below).
    // Plant 16 clusters with tight noise, query from the same distribution.
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian().toFloat * 5f))
    val pts = (0 until 400).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.zip(Array.fill(64)(rnd.nextGaussian().toFloat * 0.3f)).map(t => t._1 + t._2))
    }
    val emb = pts.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, emb, 3, nlist = 16, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.9, s"recall@3 = $recall (${(bf & ivf).size}/${bf.size})")
  }

  test("IVF recall grows monotonically with nprobe on i.i.d. fixture embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(q, emb, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nprobe: Int): Double = {
      val ivf = Similarity.ivfTopK(q, emb, 3, nlist = 16, nprobe = nprobe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & ivf).size.toDouble / bf.size
    }
    val r2 = recallAt(2); val r8 = recallAt(8); val r16 = recallAt(16)
    assert(r2 <= r8 && r8 <= r16, s"recall not monotone: $r2, $r8, $r16")
    assert(r16 == 1.0, s"exhaustive probing must be exact, got $r16")
  }

  test("k-means centroids are deterministic and cover multiple cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val c1 = Similarity.kmeansCentroids(emb, nlist = 8, iters = 2)
    val c2 = Similarity.kmeansCentroids(emb, nlist = 8, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "non-deterministic centroids")
    // trained centroids must differ from the raw init (training moved them)
    val init = Similarity.kmeansCentroids(emb, nlist = 8, iters = 0)
    assert(c1.map(_.toSeq).toSeq != init.map(_.toSeq).toSeq)
  }

  test("threshold-p semantics (label_counter.py:56-68): neighbors below p excluded") {
    val vs = (0 until 60).map(i => (i.toLong, vec(i)))
    val emb = vs.toDF("vec_id", "embedding")
    val none = Similarity.ivfTopK(emb.filter($"vec_id" < 3), emb, 5,
      nlist = 4, nprobe = 4, minScore = 1.1)
    assert(none.count() == 0)
    val thr = Similarity.ivfTopK(emb.filter($"vec_id" < 3), emb, 5,
      nlist = 4, nprobe = 4, minScore = 0.0).collect()
    assert(thr.forall(_.getDouble(3) >= 0.0))
    val unthr = Similarity.ivfTopK(emb.filter($"vec_id" < 3), emb, 5,
      nlist = 4, nprobe = 4)
    assert(thr.length <= unthr.count())
  }

  test("sign buckets are deterministic across evaluations") {
    val vs = (0 until 20).map(i => (i.toLong, vec(i)))
    val emb = vs.toDF("vec_id", "embedding")
    val b1 = Similarity.withSignBucket(emb, 6, 64).select("vec_id", "bucket").collect().toSet
    val b2 = Similarity.withSignBucket(emb, 6, 64).select("vec_id", "bucket").collect().toSet
    assert(b1 == b2)
  }
}

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("token counts handle empty and multi-space text") {
    val df = Seq((0L, "a b  c"), (1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 3, 1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("langId picks stopword-majority language, zh on CJK") {
    val df = Seq(
      (0L, "the cat and the hat of a dog"),
      (1L, "der hund und die katze ist ein tier"),
      (2L, "el perro y la casa de madrid es"),
      (3L, "le chat et la maison est un animal"),
      (4L, "这 是 中文 文本"),
      (5L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en"); assert(got(1L) == "de"); assert(got(2L) == "es")
    assert(got(3L) == "fr"); assert(got(4L) == "zh"); assert(got(5L) == "und")
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq((0L, "Hello  World"), (1L, "hello world")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("rolling min-hash fingerprint: stable on identical, distinct on disjoint content") {
    val df = Seq((0L, "a b c d e f g"), (1L, "a b c d e f g"), (2L, "t u v w x y z"))
      .toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextAnalysis.rollingMinHash($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    // disjoint gram sets ⇒ distinct min-hashes (collision odds 2^-60): a
    // regression to a constant fingerprint fails here
    assert(fp(2L) != fp(0L), s"fingerprint collapsed to a constant: $fp")
  }
}

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("binary round-trip: synth → decode recovers header fields deterministically") {
    val docs = Seq((1L, "hello world payload"), (2L, "another payload body x"))
      .toDF("doc_id", "text")
    val media = Multimodal.synthMedia(docs)
    val metas = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(metas.length == 2)
    assert(metas.forall(m => m.width >= 0 && m.width < 4096))
    assert(metas.forall(m => m.n_bytes > 20))
    assert(metas.map(_.kind).forall(Set("image", "audio", "video")))
    // determinism
    val again = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(metas.toSeq == again.toSeq)
  }

  test("frameSample takes every stride-th post-header byte; byteHistogram sums to payload length") {
    val docs = Seq((7L, "abcdefghij" * 5)).toDF("doc_id", "text") // 50-char payload
    val media = Multimodal.synthMedia(docs)
    val payload = media.select("payload").head.getAs[Array[Byte]](0)
    val sampled = Multimodal.frameSample(media, stride = 7)
      .select("sampled_bytes").head.getAs[Array[Byte]](0)
    assert(sampled.toSeq == (20 until payload.length by 7).map(payload(_)))
    val hist = Multimodal.byteHistogram(media)
      .select("byte_hist").head.getSeq[Int](0)
    assert(hist.length == 16 && hist.sum == payload.length)
  }
}
