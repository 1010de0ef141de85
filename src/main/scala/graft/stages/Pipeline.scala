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

  final case class Result(turns: Dataset[Turn], mentions: DataFrame,
                          linked: DataFrame, canon: DataFrame,
                          triples: DataFrame, metrics: Seq[StageMetric])

  /** Pure in-memory run (no snapshot layer) — used by queries and bench. */
  def run(spark: SparkSession, nConvs: Long, seed: Long = 42L): Result = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val turns = Transcripts.turns(spark, nConvs, seed)
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    val mentions = Detect.run(turns, tagger)
    val alias = Transcripts.aliasRows.toDF()
    // exact-only linking in the hot path: the whole pipeline stays ONE
    // Spark action (no mid-plan probe, no cache materialization); fuzzy
    // NIL-recovery is a separate stage (see runWithSnapshots / Link.run)
    val linked = Link.run(mentions, alias, enableFuzzy = false)
    val sameAs = Transcripts.sameAs.toDF("src", "dst")
    val canon = Canon.run(linked, sameAs)
    val triples = Triples.run(canon)
    Result(turns, mentions.toDF(), linked.toDF(), canon.toDF(), triples.toDF(), Nil)
  }

  /** Snapshot-committed run rooted at `workDir`; a rerun after a crash (or a
    * plain rerun) skips every stage whose snapshot is already committed —
    * byte-identical outputs by construction (content-addressed inputs,
    * deterministic stages).
    */
  def runWithSnapshots(spark: SparkSession, nConvs: Long, workDir: String,
                       seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val inputKey = s"n${nConvs}_s$seed"

    val turnsDf = SnapshotIO.resumeOrCompute(spark, workDir, "transcripts", inputKey) {
      Transcripts.turns(spark, nConvs, seed).toDF()
    }
    val turns = turnsDf.as[Turn]

    val mentions = SnapshotIO.resumeOrCompute(spark, workDir, "mentions", inputKey) {
      val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
      Detect.run(turns, tagger).toDF()
    }

    val linked = SnapshotIO.resumeOrCompute(spark, workDir, "linked", inputKey) {
      Link.run(mentions.as[Mention], Transcripts.aliasRows.toDF()).toDF()
    }

    val canon = SnapshotIO.resumeOrCompute(spark, workDir, "canon", inputKey) {
      Canon.run(linked.as[LinkedMention], Transcripts.sameAs.toDF("src", "dst")).toDF()
    }

    val triples = SnapshotIO.resumeOrCompute(spark, workDir, "triples", inputKey) {
      Triples.run(canon.as[CanonMention]).toDF()
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
    val nPred = p.count(); val nGold = g.count()
    val nMatch = p.join(g, keys, "inner").count()
    val prec = if (nPred == 0) 0.0 else nMatch.toDouble / nPred
    val rec = if (nGold == 0) 0.0 else nMatch.toDouble / nGold
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    p.unpersist(); g.unpersist()
    Prf(prec, rec, f1, nPred, nGold, nMatch)
  }

  val spanKeys = Seq("conv_id", "turn_idx", "start", "end", "label")
  val tripleKeys = Seq("subj", "pred", "obj", "conv_id", "turn_idx")

  /** Per-type classification report (`CC/trainer.py:243-246` /
    * `origin_bert.py:140-141` analog): per-label P/R/F1 plus a micro total
    * row (label = null), via `rollup` over the match/pred/gold counts.
    */
  def perTypeReport(pred: DataFrame, gold: DataFrame,
                    keys: Seq[String] = spanKeys): DataFrame = {
    val p = pred.select(keys.map(col): _*).distinct()
    val g = gold.select(keys.map(col): _*).distinct()
    val joinKeys = keys
    val both = p.withColumn("in_pred", lit(1))
      .join(g.withColumn("in_gold", lit(1)), joinKeys, "full_outer")
      .select(col("label"),
        coalesce(col("in_pred"), lit(0)).as("in_pred"),
        coalesce(col("in_gold"), lit(0)).as("in_gold"))
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
