package graft.stages

import org.apache.spark.sql.{DataFrame, Dataset}
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
  *     (`groupBy` on the composite key — hot conversations spread across
  *     partitions because turn_idx is in the key; per-turn lists are bounded
  *     by text length, so no skew or memory hazard);
  *   - within-turn pairing is a per-row flatMap over those bounded lists —
  *     no self-join of the 10^12-row mention table;
  *   - the cross-turn rule uses `lag` over
  *     `Window.partitionBy(conv_id).orderBy(turn_idx)` on the *aggregated*
  *     (one-row-per-turn) relation — the window input per conversation is
  *     its turn count, not its mention count. For pathological
  *     million-turn conversations the same rule is expressible as an
  *     equi-join on (conv_id, turn_idx−1), which shuffles on the composite
  *     key; we keep the window (stable turn ordering is an explicit
  *     contract) and rely on window spill.
  */
object Triples {

  private case class TurnMentions(conv_id: String, turn_idx: Int,
                                  ms: Seq[(Int, String, String)]) // (start, label, canon)

  def run(canon: Dataset[CanonMention]): Dataset[Triple] =
    assemble(canon, useWindow = true)

  /** Scale-path variant: the cross-turn context comes from an equi-join on
    * (conv_id, turn_idx−1) instead of a per-conversation window. Exactly
    * equivalent for the k=1 rule (asserted in tests), and immune to the
    * window's whole-conversation-in-one-partition requirement — the join
    * shuffles on the composite key, so a million-turn conversation spreads
    * across reducers. Use when conversation sizes are unbounded.
    */
  def runJoinBased(canon: Dataset[CanonMention]): Dataset[Triple] =
    assemble(canon, useWindow = false)

  private def assemble(canon: Dataset[CanonMention], useWindow: Boolean): Dataset[Triple] = {
    val spark = canon.sparkSession
    import spark.implicits._

    val perTurn = canon
      .filter(col("canonical_id").isNotNull)
      // ONE exchange serves both downstream operators: hash-partitioning on
      // conv_id satisfies the aggregation's ClusteredDistribution on
      // (conv_id, turn_idx) AND the window's (or prev-join's) on conv_id.
      // Without it the plan pays TWO exchanges — the agg shuffles on the
      // composite key and the window re-shuffles the aggregated rows — and
      // collect_list partials don't compress, so the first exchange shipped
      // the full struct volume anyway (plan-asserted in PlansSpec). Skew
      // bound: a conversation's mentions fit one partition — the same
      // invariant the per-conversation window already requires.
      .repartition(col("conv_id"))
      .groupBy(col("conv_id"), col("turn_idx"))
      .agg(sort_array(collect_list(struct(col("start"), col("label"),
        col("canonical_id")))).as("ms"))

    val withPrev = if (useWindow) {
      val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
      perTurn
        .withColumn("prev_idx", lag(col("turn_idx"), 1).over(w))
        .withColumn("prev_ms", lag(col("ms"), 1).over(w))
    } else {
      val prev = perTurn.select(col("conv_id"),
        (col("turn_idx") + 1).as("turn_idx"),
        col("turn_idx").as("prev_idx"), col("ms").as("prev_ms"))
      perTurn.join(prev, Seq("conv_id", "turn_idx"), "left")
        .select(col("conv_id"), col("turn_idx"), col("ms"),
          col("prev_idx"), col("prev_ms"))
    }

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

      val pers = ms.filter(_._2 == "PER")
      val orgsM = ms.filter(_._2 == "ORG")
      val locs = ms.filter(_._2 == "LOC")
      val within =
        (for (p <- pers; o <- orgsM) yield Triple(p._3, "affiliated_with", o._3, convId, turnIdx)) ++
        (for (i <- ms.indices; j <- ms.indices; if i < j;
              if ms(i)._2 == "PER" && ms(j)._2 == "PER" && ms(i)._3 != ms(j)._3)
          yield Triple(ms(i)._3, "mentions_with", ms(j)._3, convId, turnIdx)) ++
        (for (o <- orgsM; l <- locs) yield Triple(o._3, "located_in", l._3, convId, turnIdx))
      val cross = for (p <- pers.map(_._3); q <- prev.filter(_._2 == "PER").map(_._3); if p != q)
        yield Triple(p, "follows_up", q, convId, turnIdx)
      // duplicates can only arise within this one turn's output (the triple
      // key embeds conv_id+turn_idx), so a local per-row dedup is exactly
      // equivalent to a global distinct() — and saves a full shuffle of the
      // entire triple table
      (within ++ cross).distinct.iterator
    }
  }

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
