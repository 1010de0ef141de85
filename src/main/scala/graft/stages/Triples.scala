package graft.stages

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/** Triple assembly: `Dataset[CanonMention] → Dataset[Triple]`.
  *
  * Fixed deterministic pattern rules over canonical ids (the "dependency
  * patterns" of the north star, kept declarative):
  *   within one turn (mentions ordered by char offset):
  *     PER×ORG → affiliated_with, PER×PER (i<j, distinct ids) → mentions_with,
  *     ORG×LOC → located_in;
  *   across adjacent turns of one conversation (turn-index window, k=1):
  *     PER(t)×PER(t−1), distinct ids → follows_up.
  *
  * Physical shape, chosen for 10^12-turn scale:
  *   - mentions are first aggregated to ONE row per (conv_id, turn_idx)
  *     (`groupBy` on the composite key — per-turn lists are bounded by text
  *     length, so no memory hazard);
  *   - within-turn pairing is a per-row flatMap over those bounded lists —
  *     no self-join of the 10^12-row mention table;
  *   - the cross-turn rule attaches the previous turn via a CHUNKED window
  *     (SURVEY §7.4: chunk size m ≫ rule depth k=1, overlap k): rows are
  *     windowed per (conv_id, turn_idx div m), so the per-task buffer is
  *     bounded by m aggregated turn rows regardless of conversation size —
  *     a pathological million-turn conversation spreads over its chunks
  *     instead of serializing one window task. Chunk boundaries are stitched
  *     by duplicating ONLY the last turn of each chunk into the next chunk
  *     as a context row (dropped after its `lag` value is consumed) — a
  *     1/m duplication factor, and exactly zero for every conversation
  *     shorter than m turns. The whole assembly keeps the ONE-exchange
  *     property (plan-asserted in PlansSpec): hash(conv_id, chunk)
  *     satisfies the (conv_id, chunk, turn_idx) aggregation, the chunk
  *     window, and bounds skew — no routing joins, no second read of the
  *     aggregated relation.
  */
object Triples {

  /** Turns per window chunk. At the default, a window task buffers at most
    * ~64k aggregated turn rows (a few MB), every real conversation fits one
    * chunk (zero duplication, plan identical to an unchunked window), and a
    * 10M-turn adversarial conversation spreads across ~160 tasks.
    */
  val DefaultChunkTurns = 65536

  /** Default path: chunked-window cross-turn attachment (see class doc).
    * Exactly equivalent to `runWindow` and `runJoinBased` on any input
    * (equivalence-tested, including chunk sizes down to 2).
    */
  def run(canon: Dataset[CanonMention],
          chunkTurns: Int = DefaultChunkTurns): Dataset[Triple] = {
    require(chunkTurns >= 2, s"chunkTurns must be ≥ 2, got $chunkTurns")
    val chunk = floor(col("turn_idx") / chunkTurns).cast("int")
    val boundary = pmod(col("turn_idx"), lit(chunkTurns)) === chunkTurns - 1
    // one pass over the mention table: every row keeps its own chunk; the
    // last turn of a chunk is ALSO emitted into the next chunk as context
    // (explode of a 1- or 2-element array — stays in whole-stage codegen)
    val dup = canon
      .filter(col("canonical_id").isNotNull)
      .withColumn("_d", explode(when(boundary,
          array(struct(chunk.as("c"), lit(false).as("ctx")),
                struct((chunk + 1).as("c"), lit(true).as("ctx"))))
        .otherwise(array(struct(chunk.as("c"), lit(false).as("ctx"))))))
      .withColumn("_chunk", col("_d.c"))
      .withColumn("_ctx", col("_d.ctx"))
      .drop("_d")
    // ONE exchange serves both downstream operators: hash(conv_id, _chunk)
    // satisfies the aggregation's ClusteredDistribution on
    // (conv_id, _chunk, turn_idx) AND the chunk window's. Context rows form
    // their own (conv_id, chunk+1, turn_idx) group, so _ctx is constant per
    // group and max() just carries it through.
    val perTurn = dup
      .repartition(col("conv_id"), col("_chunk"))
      .groupBy(col("conv_id"), col("_chunk"), col("turn_idx"))
      .agg(sort_array(collect_list(struct(col("start"), col("label"),
        col("canonical_id")))).as("ms"), max(col("_ctx")).as("_ctx"))
    val w = Window.partitionBy(col("conv_id"), col("_chunk")).orderBy(col("turn_idx"))
    val withPrev = perTurn
      .withColumn("prev_idx", lag(col("turn_idx"), 1).over(w))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      // a context row's own triples are emitted by its real copy in the
      // previous chunk; it exists only to feed the lag above
      .filter(!col("_ctx"))
      .select(prevCols: _*)
    emit(withPrev)(canon.sparkSession)
  }

  /** Unchunked window variant: requires every conversation to fit one
    * window task (zero joins, zero duplication, single exchange). Kept as
    * the equivalence-test witness for the stable-turn-ordering contract.
    */
  def runWindow(canon: Dataset[CanonMention]): Dataset[Triple] =
    emit(attachPrevWindow(aggregatePerTurn(canon)))(canon.sparkSession)

  /** Join-based variant: the cross-turn context comes from an equi-join on
    * (conv_id, turn_idx−1) instead of any window. Exactly equivalent for
    * the k=1 rule (asserted in tests); shuffles the aggregated relation
    * twice (both join inputs), so the chunked window is preferred — kept as
    * the second independent witness.
    */
  def runJoinBased(canon: Dataset[CanonMention]): Dataset[Triple] = {
    val perTurn = aggregatePerTurn(canon)
    val prev = perTurn.select(col("conv_id"),
      (col("turn_idx") + 1).as("turn_idx"),
      col("turn_idx").as("prev_idx"), col("ms").as("prev_ms"))
    val withPrev = perTurn.join(prev, Seq("conv_id", "turn_idx"), "left")
      .select(prevCols: _*)
    emit(withPrev)(canon.sparkSession)
  }

  private def aggregatePerTurn(canon: Dataset[CanonMention]): DataFrame =
    canon
      .filter(col("canonical_id").isNotNull)
      .repartition(col("conv_id"))
      .groupBy(col("conv_id"), col("turn_idx"))
      .agg(sort_array(collect_list(struct(col("start"), col("label"),
        col("canonical_id")))).as("ms"))

  private val prevCols: Seq[Column] = Seq(col("conv_id"), col("turn_idx"),
    col("ms"), col("prev_idx"), col("prev_ms"))

  private def attachPrevWindow(perTurn: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    perTurn
      .withColumn("prev_idx", lag(col("turn_idx"), 1).over(w))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .select(prevCols: _*)
  }

  private def emit(withPrev: DataFrame)(spark: org.apache.spark.sql.SparkSession): Dataset[Triple] = {
    import spark.implicits._
    withPrev.flatMap { row =>
      val convId = row.getString(0)
      val turnIdx = row.getInt(1)
      val ms = row.getSeq[org.apache.spark.sql.Row](2)
        .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      // dense turn indices are a generator invariant, but guard anyway:
      // the window only yields a valid "previous turn" when it is adjacent.
      val prevAdjacent = !row.isNullAt(3) && row.getInt(3) == turnIdx - 1
      val prev = if (prevAdjacent && !row.isNullAt(4))
        row.getSeq[org.apache.spark.sql.Row](4)
          .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      else Seq.empty

      val within = withinTurnTriples(convId, turnIdx, ms)
      val cross = followUps(convId, turnIdx,
        ms.filter(_._2 == "PER").map(_._3), prev.filter(_._2 == "PER").map(_._3))
      // duplicates can only arise within this one turn's output (the triple
      // key embeds conv_id+turn_idx), so a local per-row dedup is exactly
      // equivalent to a global distinct() — and saves a full shuffle of the
      // entire triple table
      (within ++ cross).distinct.iterator
    }
  }

  /** Within-turn rule body — the ONE source of truth shared by the batch
    * emit above and both streaming paths (`StreamingTriples`). `ms` is the
    * turn's (start, label, canonical_id) list sorted by start.
    */
  private[graft] def withinTurnTriples(convId: String, turnIdx: Int,
      ms: Seq[(Int, String, String)]): Seq[Triple] = {
    val pers = ms.filter(_._2 == "PER")
    val orgs = ms.filter(_._2 == "ORG")
    val locs = ms.filter(_._2 == "LOC")
    (for (p <- pers; o <- orgs) yield Triple(p._3, "affiliated_with", o._3, convId, turnIdx)) ++
    (for (i <- ms.indices; j <- ms.indices; if i < j;
          if ms(i)._2 == "PER" && ms(j)._2 == "PER" && ms(i)._3 != ms(j)._3)
      yield Triple(ms(i)._3, "mentions_with", ms(j)._3, convId, turnIdx)) ++
    (for (o <- orgs; l <- locs) yield Triple(o._3, "located_in", l._3, convId, turnIdx))
  }

  /** Cross-turn (k=1) rule body, shared like `withinTurnTriples`. */
  private[graft] def followUps(convId: String, turnIdx: Int,
      pers: Seq[String], prevPers: Seq[String]): Seq[Triple] =
    for (p <- pers; q <- prevPers; if p != q)
      yield Triple(p, "follows_up", q, convId, turnIdx)

  /** Per-conversation triple counts with **two-phase salted aggregation**:
    * partial count on (conv_id, salt) spreads a hot conversation over S
    * reducers, final sum on conv_id sees at most S rows per conversation.
    * (north_rule hot-conversation skew handling, demonstrated explicitly;
    * with AQE skew handling on this is belt-and-braces.)
    */
  def triplesPerConversation(triples: Dataset[Triple], salt: Int = 16): DataFrame = {
    triples
      .groupBy(col("conv_id"), pmod(xxhash64(col("turn_idx")), lit(salt)).as("_salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("conv_id"))
      .agg(sum(col("partial")).as("n_triples"))
  }
}
