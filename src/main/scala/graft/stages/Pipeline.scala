package graft.stages

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.io.SnapshotIO
import graft.synth.Transcripts

/** End-to-end KG-construction flow:
  * transcripts → detect → link → canonicalize → triples,
  * each stage committed as a content-addressed snapshot (idempotent resume)
  * with per-stage row counters appended to a metrics table.
  */
object Pipeline {

  /** Encode dictionary for the packed triple-assembly path: canonical ids
    * are elected as min(entity_id) over same-as components, so the alias
    * ids ∪ same-as vertices is closed under canonicalization.
    */
  private[graft] lazy val transcriptsDict: TripleDict = TripleDict(
    Transcripts.aliasRows.map(_.label),
    Transcripts.aliasRows.map(_.entity_id) ++
      Transcripts.sameAs.flatMap(p => Seq(p._1, p._2)))

  /** conv_id codec for the synthetic corpus (`conv_%08d`, Transcripts):
    * numeric-derivable ids let the triple exchange carry an 8-byte long
    * instead of the 13-char id string. The rlike guard accepts ONLY ids
    * `decode` provably inverts — exactly 8 digits (the %08d zero-padding),
    * or 9–18 digits with no leading zero (what %08d prints past 8 digits);
    * a 9+-digit id WITH a leading zero would encode to a different
    * conversation's key, so it must fail, not round-trip wrong. The guard
    * also keeps the ANSI cast from throwing its own error — malformed ids
    * flow to runEncoded's loud raise_error instead.
    */
  private[graft] val transcriptsConvCodec: Triples.ConvCodec = Triples.ConvCodec(
    encode = c => when(c.rlike("^conv_(\\d{8}|[1-9]\\d{8,17})$"),
      substring(c, 6, 18).cast("long")),
    decode = v => f"conv_$v%08d",
    // the synthetic corpus is keyed by a dense sequence id — every bench
    // scale fits 32 bits, so the sorted exchange packs (key, chunk, turn)
    // into one long (2-column rows). A ≥ 2^32 key aborts LOUDLY (verified
    // per row in Triples), never aliases.
    fits32 = true)

  /** JVM-side mirror of `transcriptsConvCodec.encode` for the fused
    * detect→packed path (`Triples.runFusedDetect` runs inside a typed
    * mapPartitions, where a Catalyst Column cannot evaluate). Accepts
    * EXACTLY the ids the rlike guard accepts — 8 digits, or 9–18 digits
    * with no leading zero — and throws loudly otherwise, the same outcome
    * as the Column path's raise_error. Round-trip equivalence with the
    * Column encode is property-tested in PipelineSpec.
    */
  private[graft] val transcriptsConvEncodeJvm: String => Long = { s =>
    val ok = s.length >= 13 && s.length <= 23 && s.startsWith("conv_") && {
      var allDigits = true
      var i = 5
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < '0' || c > '9') allDigits = false
        i += 1
      }
      allDigits && (s.length == 13 || s.charAt(5) != '0')
    }
    if (!ok) throw new IllegalStateException(
      s"Triples.runEncoded: convCodec failed on: $s")
    java.lang.Long.parseLong(s.substring(5))
  }

  /** Lazily-built pipeline stages. Nothing runs at construction time: the
    * connected-components loop (which needs Spark actions of its own) only
    * executes when `canon`/`triples` is first touched, so a consumer of
    * `mentions` alone (e.g. a per-type eval report) never pays for CC.
    * `triples` self-persists on first access because it is the typical
    * fan-in point consumed by several downstream aggregations.
    */
  final class Result(spark: SparkSession, nConvs: Long, seed: Long,
                     persistTriples: Boolean = true) {
    import spark.implicits._
    lazy val turns: Dataset[Turn] = Transcripts.turns(spark, nConvs, seed)
    private lazy val tagger =
      Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    lazy val mentions: DataFrame = Detect.run(turns, tagger).toDF()
    // exact-only linking in the hot path, FUSED since round 7: the linked
    // and canon relations are emitted straight from the tagger + driver
    // LUTs (no Mention Dataset, no broadcast joins, no CC jobs) — output
    // identical to the staged Link.run/Canon.run chain (equivalence-tested
    // in PipelineSpec; q22/q36/q48 oracles unchanged). Fuzzy NIL-recovery
    // stays a separate staged pass (see runWithSnapshots / Link.run).
    lazy val linked: DataFrame =
      Link.runFusedDetect(turns, tagger, Transcripts.aliasRows).toDF()
    lazy val canon: DataFrame =
      Canon.runFusedLinked(linked.as[LinkedMention], Transcripts.sameAs).toDF()
    // fused detect→packed sorted exchange (round 7, VERDICT r6 item 1):
    // the tagger emits Packed32 wire rows directly — no Mention string
    // Dataset, no link/canon/rank broadcast joins in the hot chain.
    // Output is bit-identical to the round-6 runEncodedSorted chain
    // (equivalence-tested in PipelineSpec; q21–q24/q48 oracles unchanged).
    // `mentions`/`linked`/`canon` above stay the mention-level API for the
    // queries that consume those relations.
    lazy val triples: DataFrame = {
      val t = Triples.runFusedDetect(turns, tagger, Transcripts.aliasRows,
        Transcripts.sameAs, Pipeline.transcriptsDict,
        Pipeline.transcriptsConvEncodeJvm, Pipeline.transcriptsConvCodec.decode).toDF()
      if (persistTriples) {
        val p = t.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        triplesPersisted = true
        p
      } else t
    }
    @volatile private var triplesPersisted = false
    /** Drop this Result's persisted triples (no-op if never materialized). */
    private[stages] def release(): Unit =
      if (triplesPersisted) triples.unpersist(false)
  }

  // Memoized per (session, nConvs, seed): the synthesized corpus is
  // deterministic, so repeated `run` calls (several bench/verify queries
  // consume different stages of the same pipeline) share one Result — the
  // CC loop and the triples persist happen once per session, not per query.
  // Eviction: a WeakHashMap alone would never collect these entries — each
  // Result captures its SparkSession (directly and through its materialized
  // Datasets), i.e. the map's values strongly reference their own key, the
  // documented WeakHashMap caveat. Entries are therefore evicted EXPLICITLY
  // by an application-end listener registered per session below.
  private val memo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.LinkedHashMap[(Long, Long), Result]]()

  /** Distinct (nConvs, seed) Results memoized per session before the
    * least-recently-USED one is evicted (and its persisted triples
    * dropped) — bounds block-manager growth when one session touches many
    * corpus sizes.
    */
  val MaxMemoPerSession = 8

  /** Pure in-memory run (no snapshot layer) — used by queries and bench.
    * @param memoize pass false for timing runs that must not share plan/cache
    *                state with earlier invocations (graft.Scaling does).
    */
  def run(spark: SparkSession, nConvs: Long, seed: Long = 42L,
          memoize: Boolean = true): Result = {
    // un-memoized runs are timing runs: no self-persist either, so the
    // measured action pays exactly the raw pipeline
    if (!memoize) return new Result(spark, nConvs, seed, persistTriples = false)
    val perSession = memo.synchronized {
      var m = memo.get(spark)
      if (m == null) {
        m = scala.collection.mutable.LinkedHashMap.empty
        memo.put(spark, m)
        // drop the session's memoized Results (and their persisted triples)
        // as soon as the session stops — see the eviction note on `memo`
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            memo.synchronized { memo.remove(spark) }
        })
      }
      m
    }
    perSession.synchronized {
      val key = (nConvs, seed)
      perSession.remove(key) match {
        case Some(hit) =>
          // access-order LRU: re-insert the hit at the end so the eviction
          // victim (head) is the least-recently-USED entry, not merely the
          // least-recently-inserted one (an insertion-order head could still
          // be in active use by another query — unpersisting it would
          // silently recompute the whole pipeline)
          perSession.put(key, hit)
          hit
        case None =>
          if (perSession.size >= MaxMemoPerSession) {
            val (k0, r0) = perSession.head
            perSession.remove(k0)
            r0.release()
          }
          val fresh = new Result(spark, nConvs, seed)
          perSession.put(key, fresh)
          fresh
      }
    }
  }

  /** Snapshot-committed run rooted at `workDir`; a rerun after a crash (or a
    * plain rerun) skips every stage whose snapshot is already committed —
    * byte-identical outputs by construction (content-addressed inputs,
    * deterministic stages).
    *
    * Staleness contract: snapshots are keyed by INPUT identity
    * (nConvs, seed) — not by code content. After upgrading the library (or
    * changing dictionaries) against an existing `workDir`, pass a new
    * `version` (it is folded into the snapshot key) or clear the workDir;
    * otherwise resume will faithfully serve the previous code's committed
    * outputs.
    *
    * @param protocol snapshot commit protocol: `AtomicRename` for
    *        POSIX/HDFS workdirs, `ManifestPointer` for object stores
    *        (no directory rename anywhere in the commit path).
    */
  def runWithSnapshots(spark: SparkSession, nConvs: Long, workDir: String,
                       seed: Long = 42L, version: String = "",
                       protocol: SnapshotIO.CommitProtocol = SnapshotIO.AtomicRename): DataFrame = {
    import spark.implicits._
    val inputKey = s"n${nConvs}_s$seed" +
      (if (version.isEmpty) "" else s"_v$version")

    val turnsDf = SnapshotIO.resumeOrCompute(spark, workDir, "transcripts", inputKey,
        protocol = protocol) {
      Transcripts.turns(spark, nConvs, seed).toDF()
    }
    val turns = turnsDf.as[Turn]

    // retry-safe manifest counters: `turns_in` is COUNTED over the stage's
    // committed input snapshot (one cheap parquet-count job over data that
    // already survived its own commit), not accumulator-derived — task
    // retries / speculative execution can double-count accumulators, and a
    // manifest is lineage of record, not telemetry (VERDICT r4 item 7).
    // mentions_out needs no counter at all: it IS the manifest's exact
    // `rows` field, counted from the stored output. Detect.run's optional
    // accumulators remain available for LIVE progress telemetry.
    val mentions = SnapshotIO.resumeOrCompute(spark, workDir, "mentions", inputKey,
      counters = Map("turns_in" -> turnsDf.count()),
      protocol = protocol) {
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Detect.run(turns, tagger).toDF()
    }

    val linked = SnapshotIO.resumeOrCompute(spark, workDir, "linked", inputKey,
        protocol = protocol) {
      // the snapshot flow is the place for fuzzy NIL-recovery: it runs as
      // its own committed stage, so the LSH jobs + persist don't sit inside
      // a hot single-action chain
      Link.run(mentions.as[Mention], Transcripts.aliasRows.toDF(), enableFuzzy = true).toDF()
    }

    val canon = SnapshotIO.resumeOrCompute(spark, workDir, "canon", inputKey,
        protocol = protocol) {
      Canon.run(linked.as[LinkedMention], Transcripts.sameAs.toDF("src", "dst")).toDF()
    }

    val triples = SnapshotIO.resumeOrCompute(spark, workDir, "triples", inputKey,
        protocol = protocol) {
      Triples.runEncodedSorted(canon.as[CanonMention], transcriptsDict,
        convCodec = Some(transcriptsConvCodec)).toDF()
    }

    // per-stage lineage metrics (rows per stage) — appended, not recomputed,
    // when a stage resumes (counts come from the committed manifests).
    triples
  }
}

/** Span / triple set evaluation — corpus-level micro P/R/F1 via exact joins
  * on the span (or triple) identity key, the distributed form of the
  * reference's span-count precision/recall scans (`CC/analysis.py:42-74`)
  * and the corpus-level seqeval contract (`CC/trainer.py:243-246`;
  * SURVEY.md §2.4 note pins corpus-level, not mean-of-batches).
  */
object Eval {
  final case class Prf(precision: Double, recall: Double, f1: Double,
                       nPred: Long, nGold: Long, nMatch: Long)

  def prf(pred: DataFrame, gold: DataFrame, keys: Seq[String]): Prf = {
    val p = pred.select(keys.map(col): _*).distinct().cache()
    val g = gold.select(keys.map(col): _*).distinct().cache()
    try {
      val nPred = p.count(); val nGold = g.count()
      val nMatch = p.join(g, keys, "inner").count()
      val prec = if (nPred == 0) 0.0 else nMatch.toDouble / nPred
      val rec = if (nGold == 0) 0.0 else nMatch.toDouble / nGold
      val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
      Prf(prec, rec, f1, nPred, nGold, nMatch)
    } finally { p.unpersist(); g.unpersist() } // no leak when an action throws
  }

  val spanKeys = Seq("conv_id", "turn_idx", "start", "end", "label")
  val tripleKeys = Seq("subj", "pred", "obj", "conv_id", "turn_idx")

  /** Per-type classification report (`CC/trainer.py:243-246` /
    * `origin_bert.py:140-141` analog): per-`typeCol` P/R/F1 plus a micro
    * total row (type = null), via `rollup` over the match/pred/gold counts.
    * Works for any key set that carries the type column (e.g.
    * `tripleKeys` with `typeCol = "pred"` gives a per-predicate report).
    */
  def perTypeReport(pred: DataFrame, gold: DataFrame,
                    keys: Seq[String] = spanKeys,
                    typeCol: String = "label"): DataFrame = {
    require(keys.contains(typeCol),
      s"perTypeReport groups by '$typeCol', which must be one of the keys $keys")
    // ONE union + groupBy replaces the old per-side distinct()s AND the
    // 5-key full_outer join (guide-§2.4 shape: 3 hash exchanges of the full
    // key tuples → 1; plan diff in plans/r07/q36_*). max(flag) per side
    // subsumes the distincts; presence of both flags IS the join match.
    // Exact-equivalence corner preserved: a SQL join never matches rows on
    // NULL keys, while groupBy groups NULLs as equal — `_nullSide` splits
    // null-key rows back apart by side (empty for fully-non-null keys, so
    // real span/triple rows group exactly as before). Pinned against a
    // reference full_outer implementation in EvalSpec.
    val nullSide = when(keys.map(col(_).isNull).reduce(_ || _), col("_side"))
      .otherwise(lit(""))
    val both = pred.select(keys.map(col): _*).withColumn("_side", lit("p"))
      .unionByName(gold.select(keys.map(col): _*).withColumn("_side", lit("g")))
      .groupBy(keys.map(col) :+ nullSide.as("_nullSide"): _*)
      .agg(max(when(col("_side") === "p", 1).otherwise(0)).as("in_pred"),
        max(when(col("_side") === "g", 1).otherwise(0)).as("in_gold"))
      .select(col(typeCol).as("label"), col("in_pred"), col("in_gold"))
    both.rollup(col("label"))
      .agg(sum(col("in_pred") * col("in_gold")).as("n_match"),
        sum(col("in_pred")).as("n_pred"),
        sum(col("in_gold")).as("n_gold"))
      .withColumn("precision", round(col("n_match") / greatest(col("n_pred"), lit(1)), 6))
      .withColumn("recall", round(col("n_match") / greatest(col("n_gold"), lit(1)), 6))
      .withColumn("f1", round(
        lit(2) * col("precision") * col("recall") /
          greatest(col("precision") + col("recall"), lit(1e-12)), 6))
  }
}
