package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core._

/** Incremental triple assembly over a mention stream with
  * `flatMapGroupsWithState` — per-conversation custom state (the
  * `KeyValueGroupedDataset` stateful path of the north star).
  *
  * State per conv_id: the last seen turn index and that turn's PER
  * canonical ids, so the cross-turn `follows_up` rule (k=1) emits as soon
  * as the next turn's mentions arrive — no window buffering of whole
  * conversations. Within-turn rules are stateless and emitted in the same
  * pass.
  *
  * State eviction: `assemble` uses `NoTimeout` (bounded demos; a
  * processing-time timeout makes the micro-batch engine schedule empty
  * batches just to evaluate timers). The production path at 10^12 turns is
  * `assembleWithEviction`: event-time timeout keyed to the transcript
  * watermark — a conversation idle past the watermark has its per-conv
  * state dropped, and turns arriving later than the watermark are filtered
  * before they reach the handler, so state is bounded by the number of
  * LIVE conversations, not all conversations ever seen.
  *
  * Ordering contract: turns of one conversation must arrive in turn order
  * across micro-batches (true for log-structured transcript ingestion;
  * within a batch the handler sorts). Out-of-order arrivals beyond that
  * need watermarked buffering upstream — documented, not needed for the
  * append-only transcript source.
  */
object StreamingTriples {

  final case class ConvState(lastTurnIdx: Int, lastPers: Seq[String])

  /** CanonMention + the turn's event time (the watermark column). */
  final case class TimedCanonMention(
      conv_id: String, turn_idx: Int, start: Int, end: Int, label: String,
      surface: String, entity_id: String, canonical_id: String,
      ts: java.sql.Timestamp)

  private def toCanon(t: TimedCanonMention): CanonMention =
    CanonMention(t.conv_id, t.turn_idx, t.start, t.end, t.label, t.surface,
      t.entity_id, t.canonical_id)

  /** Shared per-group rule body (same triple rules as the batch stage). */
  private def emitGroup(convId: String, rows: Seq[CanonMention],
                        st0: ConvState): (ConvState, Vector[Triple]) = {
    val byTurn = rows.groupBy(_.turn_idx).toSeq.sortBy(_._1)
    var st = st0
    val out = byTurn.iterator.flatMap { case (turnIdx, ms0) =>
      val ms = ms0.sortBy(_.start).map(m => (m.start, m.label, m.canonical_id))
      val pers = ms.filter(_._2 == "PER")
      val orgs = ms.filter(_._2 == "ORG")
      val locs = ms.filter(_._2 == "LOC")
      val within =
        (for (p <- pers; o <- orgs) yield Triple(p._3, "affiliated_with", o._3, convId, turnIdx)) ++
        (for (i <- ms.indices; j <- ms.indices; if i < j;
              if ms(i)._2 == "PER" && ms(j)._2 == "PER" && ms(i)._3 != ms(j)._3)
          yield Triple(ms(i)._3, "mentions_with", ms(j)._3, convId, turnIdx)) ++
        (for (o <- orgs; l <- locs) yield Triple(o._3, "located_in", l._3, convId, turnIdx))
      val cross =
        if (st.lastTurnIdx == turnIdx - 1)
          for (p <- pers.map(_._3); q <- st.lastPers; if p != q)
            yield Triple(p, "follows_up", q, convId, turnIdx)
        else Nil
      st = ConvState(turnIdx, pers.map(_._3))
      (within ++ cross).distinct.iterator
    }.toVector
    (st, out)
  }

  /** Production variant: event-time state eviction. Conversations whose
    * last turn is older than the watermark get their state removed by the
    * timeout callback; late mentions (ts below the watermark) are dropped
    * by the watermark operator before the handler sees them.
    *
    * @param idleGap how long a conversation may stay silent past its last
    *        turn's event time before its state is evicted.
    */
  def assembleWithEviction(mentions: Dataset[TimedCanonMention],
                           watermark: String = "1 hour",
                           idleGap: String = "30 minutes"): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._

    mentions.withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (convId: String, rows: Iterator[TimedCanonMention], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle conversation: drop its state, emit nothing
            Iterator.empty
          } else {
            val rowSeq = rows.toSeq
            val (st, out) = emitGroup(convId, rowSeq.map(toCanon),
              state.getOption.getOrElse(ConvState(-1, Nil)))
            state.update(st)
            // evict once the watermark passes last-event-time + idleGap
            val maxTs = rowSeq.iterator.map(_.ts.getTime).max
            state.setTimeoutTimestamp(maxTs, idleGap)
            out.iterator
          }
      }
  }

  def assemble(mentions: Dataset[CanonMention]): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._

    mentions.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (convId: String, rows: Iterator[CanonMention], state: GroupState[ConvState]) =>
          val (st, out) = emitGroup(convId, rows.toSeq,
            state.getOption.getOrElse(ConvState(-1, Nil)))
          state.update(st)
          out.iterator
      }
  }
}
