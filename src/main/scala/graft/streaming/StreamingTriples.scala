package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core._
import graft.stages.Triples

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
  * Ordering contract: `assemble` (the in-order demo path) requires turns of
  * one conversation to arrive in turn order across micro-batches.
  * `assembleWithEviction` does NOT: it buffers per-conversation turn PER
  * sets keyed by turn index, so a turn arriving in any order within the
  * watermark window still links — a `follows_up` pair emits exactly once,
  * when the later-ARRIVING side of the adjacent-turn pair lands. The only
  * per-turn atomicity assumption kept is that one turn's mentions share a
  * micro-batch (true for the upstream detect stage, which emits whole
  * turns). A turn stays linkable while `ts + idleGap` is above the
  * watermark — the same horizon as conversation-idleness eviction, now per
  * turn — so state is bounded by live turns in the horizon, not by
  * conversation length.
  */
object StreamingTriples {

  final case class ConvState(lastTurnIdx: Int, lastPers: Seq[String])

  /** CanonMention + the turn's event time (the watermark column). */
  final case class TimedCanonMention(
      conv_id: String, turn_idx: Int, start: Int, end: Int, label: String,
      surface: String, entity_id: String, canonical_id: String,
      ts: java.sql.Timestamp)

  /** Shared per-group rule body (delegates to the batch stage's single
    * source of truth, `Triples.withinTurnTriples`/`followUps`).
    */
  private def emitGroup(convId: String, rows: Seq[CanonMention],
                        st0: ConvState): (ConvState, Vector[Triple]) = {
    val byTurn = rows.groupBy(_.turn_idx).toSeq.sortBy(_._1)
    var st = st0
    val out = byTurn.iterator.flatMap { case (turnIdx, ms0) =>
      // full (start, label, canonical_id) key, NOT start alone: start-ties
      // would otherwise keep groupBy arrival order — nondeterministic across
      // replays and divergent from the batch sort_array
      val ms = ms0.map(m => (m.start, m.label, m.canonical_id))
        .sorted(Triples.mentionKeyOrder)
      val pers = ms.filter(_._2 == "PER").map(_._3)
      val within = Triples.withinTurnTriples(convId, turnIdx, ms)
      val cross =
        if (st.lastTurnIdx == turnIdx - 1)
          Triples.followUps(convId, turnIdx, pers, st.lastPers)
        else Nil
      st = ConvState(turnIdx, pers)
      (within ++ cross).distinct.iterator
    }.toVector
    (st, out)
  }

  /** A buffered turn: event time + the turn's PER canonical ids. */
  final case class TurnPers(ts: Long, pers: Seq[String])

  /** Per-conversation state for the eviction path: turn_idx → TurnPers for
    * every turn still inside the linkability horizon.
    */
  final case class BufState(turns: Map[Int, TurnPers])

  /** Delay string → milliseconds via Spark's OWN interval parser, so every
    * form `withWatermark`/`setTimeoutTimestamp` accept ("90 seconds",
    * "1 hour 30 minutes", "2 weeks") parses identically here. Month-based
    * intervals are rejected — they have no fixed millisecond length.
    */
  private def parseDelayMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"month-based delay '$s' has no fixed ms length")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Production variant: event-time state eviction + out-of-order turn
    * arrival (see class doc). Late mentions (ts below the watermark) are
    * dropped by the watermark operator before the handler sees them;
    * within-watermark turns may arrive in ANY order — within-turn triples
    * emit on arrival, and each adjacent-turn `follows_up` pair emits when
    * its later-arriving side lands. Buffered turns are pruned (inline and
    * by the timeout callback) once the watermark passes `ts + idleGap`; a
    * cross-turn link whose earlier side idled past that horizon is dropped,
    * exactly like the conversation-idle eviction it generalizes.
    *
    * @param idleGap how long past its event time a turn stays linkable /
    *        a conversation may stay silent before its state is evicted.
    */
  def assembleWithEviction(mentions: Dataset[TimedCanonMention],
                           watermark: String = "1 hour",
                           idleGap: String = "30 minutes"): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val idleGapMs = parseDelayMs(idleGap)

    mentions.withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (convId: String, rows: Iterator[TimedCanonMention], state: GroupState[BufState]) =>
          def prune(turns: Map[Int, TurnPers], wm: Long): Map[Int, TurnPers] =
            if (wm <= 0) turns else turns.filter(_._2.ts + idleGapMs > wm)
          def rearm(turns: Map[Int, TurnPers]): Unit =
            if (turns.nonEmpty)
              state.setTimeoutTimestamp(turns.valuesIterator.map(_.ts).max, idleGap)
          if (state.hasTimedOut) {
            // the timer is always armed at max(buffered ts) + idleGap, so
            // when it fires EVERY buffered turn is past its linkability
            // horizon (ts + idleGap ≤ maxTs + idleGap < wm) — drop it all
            state.remove()
            Iterator.empty
          } else {
            var buf = prune(state.getOption.map(_.turns).getOrElse(Map.empty),
              state.getCurrentWatermarkMs())
            val out = Vector.newBuilder[Triple]
            // ascending turn order within the batch: an in-batch adjacent
            // pair links via the prev lookup of its later turn
            val byTurn = rows.toSeq.groupBy(_.turn_idx).toSeq.sortBy(_._1)
            byTurn.foreach { case (turnIdx, ms0) =>
              val ts = ms0.iterator.map(_.ts.getTime).max
              val ms = ms0.map(m => (m.start, m.label, m.canonical_id))
                .sorted(Triples.mentionKeyOrder) // batch sort_array order

              val pers = ms.filter(_._2 == "PER").map(_._3)
              out ++= Triples.withinTurnTriples(convId, turnIdx, ms).distinct
              // link to the previous turn if it has already arrived …
              buf.get(turnIdx - 1).foreach { prev =>
                out ++= Triples.followUps(convId, turnIdx, pers, prev.pers).distinct
              }
              // … and to an out-of-order next turn that arrived earlier
              buf.get(turnIdx + 1).foreach { nxt =>
                out ++= Triples.followUps(convId, turnIdx + 1, nxt.pers, pers).distinct
              }
              buf += turnIdx -> TurnPers(ts, pers)
            }
            state.update(BufState(buf))
            rearm(buf)
            out.result().iterator
          }
      }
  }

  /** A buffered turn in the PACKED state layout: event time + the turn's
    * PER canonical ids as entity RANKS into the TripleDict (4-byte ints on
    * the state-store wire instead of id strings).
    */
  final case class PackedTurnPers(ts: Long, pers: Seq[Int])

  /** Packed per-conversation state — see [[assembleWithEvictionEncoded]]. */
  final case class PackedBufState(turns: Map[Int, PackedTurnPers])

  /** Dictionary-encoded variant of [[assembleWithEviction]] (VERDICT r6
    * item 4): same handler logic, out-of-order semantics, pruning and
    * timers, but the per-conversation state stores entity RANKS (ints)
    * instead of canonical-id strings, and the per-turn rule evaluation runs
    * on the batch path's packed mention longs (`Triples.emitTurnRules`) —
    * label compares become int compares and subj/obj strings are shared
    * references into the broadcast entity array. The round-6 `nodetect`
    * A/B pinned the streaming ceiling on this stateful operator, so the
    * bytes serialized into the state store per batch are the lever: a
    * buffered turn's state row shrinks from one string per PER mention
    * (~16–24 B each in UnsafeRow layout) to one int (4 B).
    *
    * Output is identical to [[assembleWithEviction]] (equivalence-tested in
    * StreamingSpec). Requires the same dictionary premise as the batch
    * encoded paths: every label and canonical id packable via `dict`
    * (loud failure otherwise — never a silent drop), mention starts inside
    * the packed layout's 23-bit bound. Use [[assembleWithEviction]] for
    * corpora without a TripleDict.
    */
  def assembleWithEvictionEncoded(mentions: Dataset[TimedCanonMention],
                                  dict: graft.stages.TripleDict,
                                  watermark: String = "1 hour",
                                  idleGap: String = "30 minutes"): Dataset[Triple] = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val idleGapMs = parseDelayMs(idleGap)
    val sc = spark.sparkContext
    val bcEnts = sc.broadcast(dict.entities)
    val bcEidRank = sc.broadcast(dict.entities.zipWithIndex.toMap)
    val bcLbRank = sc.broadcast(dict.labels.zipWithIndex.toMap)
    val perB = dict.rankOfLabel("PER")
    val orgB = dict.rankOfLabel("ORG")
    val locB = dict.rankOfLabel("LOC")

    mentions.withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (convId: String, rows: Iterator[TimedCanonMention], state: GroupState[PackedBufState]) =>
          def prune(turns: Map[Int, PackedTurnPers], wm: Long): Map[Int, PackedTurnPers] =
            if (wm <= 0) turns else turns.filter(_._2.ts + idleGapMs > wm)
          def rearm(turns: Map[Int, PackedTurnPers]): Unit =
            if (turns.nonEmpty)
              state.setTimeoutTimestamp(turns.valuesIterator.map(_.ts).max, idleGap)
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ents: IndexedSeq[String] =
              scala.collection.immutable.ArraySeq.unsafeWrapArray(bcEnts.value)
            val eidRank = bcEidRank.value
            val lbRank = bcLbRank.value
            val dedup = new Triples.PairDedup
            // packed follows_up — `Triples.followUps(...).distinct` on ranks:
            // p outer / q inner in mention order, per-call dedup on the same
            // (predId=3, subj, obj) key the batch walker uses
            def followUpsPacked(out: scala.collection.mutable.ArrayBuffer[Triple],
                                turnIdx: Int, cur: Seq[Int], prev: Seq[Int]): Unit = {
              dedup.clear()
              cur.foreach { p =>
                prev.foreach { q =>
                  if (p != q && dedup.add((3L << 62) | (p.toLong << 31) | q.toLong))
                    out += Triple(ents(p), "follows_up", ents(q), convId, turnIdx)
                }
              }
            }
            var buf = prune(state.getOption.map(_.turns).getOrElse(Map.empty),
              state.getCurrentWatermarkMs())
            val out = new scala.collection.mutable.ArrayBuffer[Triple]()
            val byTurn = rows.toSeq.groupBy(_.turn_idx).toSeq.sortBy(_._1)
            byTurn.foreach { case (turnIdx, ms0) =>
              val ts = ms0.iterator.map(_.ts.getTime).max
              val ms = new Array[Long](ms0.length)
              var i = 0
              ms0.foreach { m =>
                // same loud-failure contract as the batch encoded paths: an
                // unpackable mention aborts, never silently drops
                val lb = lbRank.getOrElse(m.label, -1)
                if (lb < 0) throw new IllegalStateException(
                  s"StreamingTriples encoded: label not in dict: ${m.label}")
                val eid = eidRank.getOrElse(m.canonical_id, -1)
                if (eid < 0) throw new IllegalStateException(
                  s"StreamingTriples encoded: canonical_id not in dict: ${m.canonical_id}")
                if (m.start < 0 || m.start >= Triples.MaxPackedStart)
                  throw new IllegalStateException(
                    s"StreamingTriples encoded: start outside [0, ${Triples.MaxPackedStart}) in $convId")
                ms(i) = (m.start.toLong << 40) | (lb.toLong << 32) | eid.toLong
                i += 1
              }
              // ascending packed sort == the batch sort_array order (rank
              // packing preserves UTF-8 order; bit 63 always 0)
              java.util.Arrays.sort(ms)
              // within-turn rules via the ONE batch rule body (prev empty —
              // cross-turn links go through the buffered-state lookups below)
              Triples.emitTurnRules(ms, ms.length, Triples.EmptyLongs, 0,
                convId, turnIdx, ents, perB, orgB, locB, dedup, out)
              val pers: Seq[Int] = {
                val b = Seq.newBuilder[Int]
                ms.foreach { v =>
                  if (((v >>> 32) & 0xff).toInt == perB) b += (v & 0xffffffffL).toInt
                }
                b.result()
              }
              buf.get(turnIdx - 1).foreach { prev =>
                followUpsPacked(out, turnIdx, pers, prev.pers)
              }
              buf.get(turnIdx + 1).foreach { nxt =>
                followUpsPacked(out, turnIdx + 1, nxt.pers, pers)
              }
              buf += turnIdx -> PackedTurnPers(ts, pers)
            }
            state.update(PackedBufState(buf))
            rearm(buf)
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
