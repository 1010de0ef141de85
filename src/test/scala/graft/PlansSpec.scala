package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core._
import graft.stages._
import graft.synth.Transcripts

/** Physical-plan audits: the scale properties claimed in the scaladoc are
  * asserted here against `.explain` output, so a regression that silently
  * changes a broadcast join into a shuffle join (or drops a parquet filter
  * pushdown) fails the suite — not just the benchmark.
  */
class PlansSpec extends SparkSpecBase {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01 scan pushes the shipdate filter and prunes columns") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
    // projection pruning: the scan must not read unneeded columns
    assert(!p.contains("l_comment") && !p.contains("l_suppkey"))
  }

  test("q02 joins dimensions via broadcast, fact side never shuffles for the dims") {
    val df = SparkEntry.queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
  }

  test("entity linking is a broadcast hash join on the alias dictionary") {
    val mentions = Seq(Mention("c", 0, 0, 5, "ORG", "Acme Corp")).toDS()
    val linked = Link.run(mentions, Transcripts.aliasRows.toDF(), enableFuzzy = false)
    val p = plan(linked.toDF())
    assert(p.contains("BroadcastHashJoin"), s"alias join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("window triple assembly: no self-join, and ONE exchange serves agg + window") {
    val canon = Seq(CanonMention("c", 0, 0, 5, "PER", "x", "PER00", "PER00")).toDS()
    val p = plan(Triples.runWindow(canon).toDF())
    // one aggregate + one window over the aggregated relation; no join at all
    assert(!p.contains("Join"), s"triples must not join:\n$p")
    assert(p.contains("Window"))
    // the conv_id repartition satisfies both the (conv,turn) aggregation
    // and the conv window — a second exchange would re-ship the full
    // struct volume (collect_list partials don't compress)
    val nEx = "Exchange".r.findAllIn(p).length
    assert(nEx == 1, s"expected exactly 1 exchange, got $nEx:\n$p")
  }

  test("chunked (default) triple assembly: no join, ONE exchange serves agg + chunk window") {
    val canon = (0 until 40).map(i =>
      CanonMention(s"c${i % 4}", i / 4, 0, 5, "PER", "x", s"PER$i", s"PER$i")).toDS()
    // the skew-proof default keeps the single-exchange property: one
    // hash(conv_id, chunk) shuffle feeds both the per-turn aggregation and
    // the chunk window; boundary stitching is an explode, not a join
    val p = plan(Triples.run(canon, chunkTurns = 2).toDF())
    assert(!p.contains("Join"), s"chunked assembly must not join:\n$p")
    assert(p.contains("Window") && p.contains("Generate"), s"window + explode expected:\n$p")
    val nEx = "Exchange".r.findAllIn(p).length
    assert(nEx == 1, s"expected exactly 1 exchange, got $nEx:\n$p")
  }

  test("encoded triple assembly: ONE shuffle exchange of packed longs, dict joins broadcast") {
    val canon = (0 until 40).map(i =>
      CanonMention(s"c${i % 4}", i / 4, 0, 5, "PER", "x", s"PER$i", s"PER$i")).toDS()
    val dict = TripleDict(Seq("PER"), (0 until 40).map(i => s"PER$i"))
    val p = plan(Triples.runEncoded(canon, dict, chunkTurns = 2).toDF())
    // the entity-rank encode must be a broadcast hash join (the mention side
    // never shuffles for it), and the assembly itself must keep the single
    // hash(conv_id, chunk) exchange — now carrying 8-byte longs per mention
    // instead of ~40-byte string structs
    assert(p.contains("BroadcastHashJoin"), s"dict encode must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join allowed:\n$p")
    val nShuffle = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nShuffle == 1, s"expected exactly 1 shuffle exchange, got $nShuffle:\n$p")
    // the exchanged mention column is the packed long, not the raw strings
    assert(p.contains("_m"), s"packed column missing from plan:\n$p")
  }

  test("sorted-exchange triple assembly: ONE shuffle, no window, partition-local sort") {
    val canon = (0 until 40).map(i =>
      CanonMention(s"c${i % 4}", i / 4, 0, 5, "PER", "x", s"PER$i", s"PER$i")).toDS()
    val dict = TripleDict(Seq("PER"), (0 until 40).map(i => s"PER$i"))
    val p = plan(Triples.runEncodedSorted(canon, dict, chunkTurns = 2).toDF())
    // same single hash(conv key, chunk) exchange as runEncoded, but the
    // grouping/ordering/lag machinery is gone: no window, no aggregation —
    // just a partition-local sort feeding the walker. The sort must NOT be
    // global (that would add a range exchange).
    assert(p.contains("BroadcastHashJoin"), s"dict encode must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join allowed:\n$p")
    assert(!p.contains("Window"), s"sorted path must not window:\n$p")
    assert(!p.contains("rangepartitioning"), s"sort must be partition-local:\n$p")
    val nShuffle = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(nShuffle == 1, s"expected exactly 1 shuffle exchange, got $nShuffle:\n$p")
  }

  test("brute-force top-k broadcasts the query side, not the corpus") {
    val emb = (0 until 10).map(i => (i.toLong, Array.fill(4)(i.toFloat))).toDF("vec_id", "embedding")
    val p = plan(graft.ops.Similarity.bruteForceTopK(emb.filter($"vec_id" < 2), emb, 3))
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast cross join:\n$p")
  }

  test("readConll plans fully distributed: no global window, no single-partition coalesce") {
    val d = java.nio.file.Files.createTempDirectory("graft_plan_conll")
    java.nio.file.Files.writeString(d.resolve("x.conll"), "a O\nb O\n\nc O\n")
    val df = graft.io.Formats.readConll(spark, s"$d/x.conll")
    val p = plan(df)
    assert(!p.contains("Window"), s"serial window survived:\n$p")
    assert(!p.contains("SinglePartition") && !p.contains("Coalesce 1"),
      s"single-partition stage survived:\n$p")
    graft.io.SnapshotIO.deleteRecursively(d)
  }

  test("whole-stage codegen covers the scalar text-analysis path") {
    // NOTE: higher-order functions (transform/filter/aggregate lambdas) are
    // CodegenFallback in Spark — the HOF-based profile columns run
    // interpreted. The scalar subset (regexp, md5, length math) must stay
    // inside WholeStageCodegen.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"),
      graft.ops.TextAnalysis.punctRatio(col("text")).as("pr"))
      .filter(col("pr") >= 0)
    val p = plan(df)
    // executedPlan.toString renders codegen spans as "*(n) Operator"
    assert(p.contains("*(") || p.contains("WholeStageCodegen"),
      s"scalar path must stay codegen'd:\n$p")
  }

  test("canon join broadcast is size-GATED: hinted for a small comp map, not for a huge one") {
    val linked = Seq(LinkedMention("c", 0, 0, 5, "ORG", "Acme", "ORG00a", "exact")).toDS()
    // small comp map (6 vertices) → broadcast hint present, mention side never shuffles
    val small = Canon.run(linked, Transcripts.sameAs.toDF("src", "dst"))
    assert(small.toDF().queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "small comp map must be broadcast-hinted")
    // force the gate shut (threshold 0) → no hint; AQE decides at runtime
    val gated = Canon.run(linked, Transcripts.sameAs.toDF("src", "dst"),
      maxBroadcastEntities = 0L)
    assert(!gated.toDF().queryExecution.optimizedPlan.toString.contains("strategy=broadcast"),
      "oversized comp map must NOT carry a forced broadcast hint")
  }

  test("Pipeline.run is lazy (zero jobs at construction) and memoized per (session, n, seed)") {
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r1 = Pipeline.run(spark, 3123L) // fresh key: nothing may execute yet
      Thread.sleep(500) // listener events post asynchronously
      assert(jobs == 0, s"Pipeline.run construction ran $jobs Spark jobs")
      val r2 = Pipeline.run(spark, 3123L)
      assert(r1 eq r2, "same (session, n, seed) must return the memoized Result")
      assert(Pipeline.run(spark, 3123L, memoize = false) ne r1)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("salted per-conversation aggregation is two-phase") {
    val t = Seq(Triple("a", "p", "b", "c1", 0)).toDS()
    val p = plan(Triples.triplesPerConversation(t))
    // two HashAggregate pairs: (partial+final) on (conv_id, salt), then on conv_id
    val nAggs = "HashAggregate".r.findAllIn(p).length
    assert(nAggs >= 4, s"expected two-phase agg, got $nAggs HashAggregates:\n$p")
  }
}
