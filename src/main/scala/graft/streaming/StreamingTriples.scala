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
  * State eviction: `NoTimeout` here — with a processing-time timeout the
  * micro-batch engine keeps scheduling empty batches to evaluate timers
  * (observed: hundreds of epochs between data batches), which is wrong for
  * this bounded demo. Production eviction for dead conversations is an
  * event-time timeout keyed to the transcript watermark
  * (`GroupStateTimeout.EventTimeTimeout` + upstream `withWatermark`).
  *
  * Ordering contract: turns of one conversation must arrive in turn order
  * across micro-batches (true for log-structured transcript ingestion;
  * within a batch the handler sorts). Out-of-order arrivals beyond that
  * need watermarked buffering upstream — documented, not needed for the
  * append-only transcript source.
  */
object StreamingTriples {

  final case class ConvState(lastTurnIdx: Int, lastPers: Seq[String])

  def assemble(mentions: Dataset[CanonMention]): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._

    mentions.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (convId: String, rows: Iterator[CanonMention], state: GroupState[ConvState]) =>
          {
            val byTurn = rows.toSeq.groupBy(_.turn_idx).toSeq.sortBy(_._1)
            var st = state.getOption.getOrElse(ConvState(-1, Nil))
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
            state.update(st)
            out.iterator
          }
      }
  }
}
