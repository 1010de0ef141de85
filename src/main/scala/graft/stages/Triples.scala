package graft.stages

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/** Dictionary for the encoded triple-assembly path (`Triples.runEncoded`):
  * label and entity-id vocabularies sorted in unsigned UTF-8 byte order —
  * Spark's binary string collation — so the packed 64-bit mention sort
  * (start, labelRank, entityRank) is EXACTLY the generic path's struct sort
  * (start, label, canonical_id). Entity ranks therefore preserve the
  * deterministic tie-break order everywhere it matters (within-turn mention
  * ordering for `mentions_with` pairs).
  *
  * Build via `TripleDict(labels, entities)`; the entity vocabulary must
  * cover every `canonical_id` the encoded path will see (the pipeline's is
  * alias-dictionary ids ∪ same-as vertices — canonical ids are elected as
  * min entity_id over components, so that union is closed). Unknown ids
  * fail LOUDLY at encode time (`raise_error`), never silently drop.
  */
final class TripleDict private (val labels: Array[String],
                                val entities: Array[String]) extends Serializable {
  @transient private lazy val labelRankMap: Map[String, Int] =
    labels.zipWithIndex.toMap
  def rankOfLabel(l: String): Int = labelRankMap.getOrElse(l, -1)
}

object TripleDict {
  /** Spark's own binary string collation, by construction: delegate to
    * `UTF8String.compareTo` (the comparator `sort_array` ultimately uses on
    * string struct fields), so the rank order can never diverge from the
    * struct sort it must mirror. (Java's `String.compareTo` would differ on
    * supplementary-plane chars.)
    */
  private[graft] val utf8Order: Ordering[String] = new Ordering[String] {
    import org.apache.spark.unsafe.types.UTF8String
    def compare(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
  }

  /** Driver-memory envelope of the entity rank dictionary — the encoded
    * paths' ONLY unbounded driver-side structure (VERDICT r6 item 2). The
    * whole canonical-entity vocabulary is collected, sorted and broadcast
    * as an `Array[String]`: at ~60–100 B per JVM entry (header + char data
    * + broadcast serialization), 50M entities is ~3–5 GB of driver heap and
    * per-executor broadcast — the practical ceiling for a healthy driver.
    * Past it the encode must NOT silently OOM mid-collect: `apply` fails
    * loudly here, naming `Triples.run` (the generic string path, which
    * never collects the entity vocabulary) as the fallback. Mirrors the
    * `ConvCodec.fits32` contract: declared bounds are enforced, never
    * trusted.
    */
  val MaxEntities: Int = 50000000

  def apply(labels: Iterable[String], entities: Iterable[String]): TripleDict =
    apply(labels, entities, MaxEntities)

  /** Test seam: the gate with an injectable bound (the 50M default cannot be
    * crossed in a unit test without building 50M strings).
    */
  private[graft] def apply(labels: Iterable[String], entities: Iterable[String],
                           maxEntities: Int): TripleDict = {
    val ls = labels.toArray.distinct.sorted(utf8Order)
    require(ls.length <= 256, s"TripleDict supports ≤256 labels, got ${ls.length}")
    val es = entities.toArray.distinct.sorted(utf8Order)
    require(es.length <= maxEntities,
      s"TripleDict entity vocabulary (${es.length}) exceeds MaxEntities " +
        s"($maxEntities) — the rank dictionary would not fit a sane driver " +
        "heap as a collected+broadcast Array[String]; use Triples.run (the " +
        "generic string-keyed path) for corpora beyond this bound")
    new TripleDict(ls, es)
  }
}

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
    val packed = canon
      .filter(col("canonical_id").isNotNull)
      .select(col("conv_id").as("_cid"), col("turn_idx"),
        struct(col("start"), col("label"), col("canonical_id")).as("_m"))
    emit(chunkedWithContext(packed, chunkTurns, 1,
      sort_array(collect_list(col("_m")))))(canon.sparkSession)
  }

  /** The chunked-window turn-context attachment (class-doc shape), shared
    * by `run` and `runEncoded` so the boundary-stitching rules have ONE
    * implementation, generalized to rule depth `k` (SURVEY §7.4 contract:
    * chunk size m ≫ overlap k). Input columns: `_cid` (conversation key —
    * string or codec long), `turn_idx`, `_m` (per-turn-or-mention payload —
    * struct, packed long, or pre-packed long array). Output:
    * (_cid, turn_idx, ms, prev_idx_1, prev_ms_1, …, prev_idx_k, prev_ms_k)
    * with context rows consumed. For k = 1 the trailing pair is aliased
    * (prev_idx, prev_ms) — the shape `emit`/`emitPacked` read.
    *
    * One pass over the mention table: every row keeps its own chunk; the
    * last k turns of a chunk are ALSO emitted into the next chunk as
    * context rows (explode of a 1- or 2-element array — stays in
    * whole-stage codegen). ONE exchange serves both downstream operators:
    * hash(_cid, _chunk) satisfies the aggregation's ClusteredDistribution
    * on (_cid, _chunk, turn_idx) AND the chunk window's. Context rows form
    * their own (_cid, chunk+1, turn_idx) groups, so _ctx is constant per
    * group and max() just carries it through; a context row's own triples
    * are emitted by its real copy in the previous chunk — it exists only
    * to feed the lags.
    *
    * Depth contract (why lags 1..k suffice): a real row for turn t in chunk
    * c has every EXISTING turn in [t−k, t) present in its window partition —
    * turns ≥ c·m as real rows, turns in [c·m−k, c·m) as context copies (the
    * overlap predicate below duplicates exactly those) — and at most k−1
    * turns lie strictly between t−d and t for d ≤ k, so turn t−d (when it
    * exists) sits at SOME lag position ≤ k. Sparse turn indices mean lag
    * position ≠ turn distance: a depth-d rule must check
    * `prev_idx_i == turn_idx − d`, exactly like the k=1 consumers do
    * (equivalence vs the unchunked window is tested for k=2 in
    * PipelineSpec).
    */
  private[graft] def chunkedWithContext(packed: DataFrame, chunkTurns: Int,
                                        k: Int, msAgg: Column): DataFrame = {
    require(k >= 1 && chunkTurns > k,
      s"chunk size must exceed overlap depth: chunkTurns=$chunkTurns k=$k")
    val chunk = floor(col("turn_idx") / chunkTurns).cast("int")
    val inOverlap = pmod(col("turn_idx"), lit(chunkTurns)) >= chunkTurns - k
    val dup = packed
      .withColumn("_d", explode(when(inOverlap,
          array(struct(chunk.as("c"), lit(false).as("ctx")),
                struct((chunk + 1).as("c"), lit(true).as("ctx"))))
        .otherwise(array(struct(chunk.as("c"), lit(false).as("ctx"))))))
      .select(col("_cid"), col("turn_idx"), col("_m"),
        col("_d.c").as("_chunk"), col("_d.ctx").as("_ctx"))
    val perTurn = dup
      .repartition(col("_cid"), col("_chunk"))
      .groupBy(col("_cid"), col("_chunk"), col("turn_idx"))
      .agg(msAgg.as("ms"), max(col("_ctx")).as("_ctx"))
    val w = Window.partitionBy(col("_cid"), col("_chunk")).orderBy(col("turn_idx"))
    def lagName(p: String, i: Int) = if (k == 1) p else s"${p}_$i"
    val withLags = (1 to k).foldLeft(perTurn) { (df, i) =>
      df.withColumn(lagName("prev_idx", i), lag(col("turn_idx"), i).over(w))
        .withColumn(lagName("prev_ms", i), lag(col("ms"), i).over(w))
    }
    withLags
      .filter(!col("_ctx"))
      .select(col("_cid") +: col("turn_idx") +: col("ms") +:
        (1 to k).flatMap(i =>
          Seq(col(lagName("prev_idx", i)), col(lagName("prev_ms", i)))): _*)
  }

  /** Mention-offset ceiling of the packed encoding: 23 bits. A single turn
    * longer than ~8.4M chars cannot pack (fails loudly; use `run`).
    */
  val MaxPackedStart: Int = 1 << 23

  /** Opt-in conv_id codec for `runEncoded`: when the table's conv ids are
    * numeric-derivable (common for transcript tables keyed by a sequence /
    * snowflake id — the synthetic corpus' `conv_%08d` is), the exchange can
    * carry an 8-byte long instead of the id string, which after the mention
    * packing is the DOMINANT exchanged byte. `encode` must be a Catalyst
    * expression (stays inside whole-stage codegen before the shuffle);
    * `decode` runs in the emit flatMap and must invert `encode` on every
    * conv_id in the table (equivalence property-tested for the synthetic
    * format). An encode that nulls (unparsable id) fails LOUDLY.
    *
    * @param fits32 declare that `encode` yields values in [0, 2^32) on this
    *        corpus (< 4.3 B conversations). The sorted exchange then packs
    *        (convKey, chunk, turn) into ONE long — a 3-column → 2-column row
    *        cut (8 B/row off the UnsafeRow through the dominant exchange).
    *        The declaration is VERIFIED per row (raise_error on an encode
    *        ≥ 2^32): a corpus that outgrows 32-bit keys aborts loudly so the
    *        operator flips this back to the 64-bit layout — it can never
    *        silently alias two conversations. A true 10^12-turn corpus
    *        (~10^10–10^11 conversations) still fits; leave false only past
    *        ~4 B conversations.
    */
  final case class ConvCodec(encode: Column => Column, decode: Long => String,
                             fits32: Boolean = false)
    extends Serializable

  /** The dictionary-encoded mention relation both encoded paths exchange:
    * (_cid conv key [string or codec long], turn_idx int, _m packed long).
    * All encode guards fail LOUDLY (raise_error) — see `runEncoded` doc.
    */
  private def packedMentions(canon: Dataset[CanonMention], dict: TripleDict,
                             convCodec: Option[ConvCodec]): DataFrame = {
    val spark = canon.sparkSession
    import spark.implicits._
    val convKey: Column = convCodec match {
      case Some(cc) => coalesce(cc.encode(col("conv_id")).cast("long"),
        raise_error(concat(lit("Triples.runEncoded: convCodec failed on: "),
          col("conv_id"))).cast("long"))
      case None => col("conv_id")
    }
    val eidDf = spark.createDataset(
        dict.entities.toIndexedSeq.zipWithIndex.map { case (e, i) => (e, i) })
      .toDF("_can", "_eid")
    val labelMap = typedlit(dict.labels.zipWithIndex.toMap)
    // loud-failure guards: a mention the dictionary can't encode must abort
    // the job (silent drops would corrupt the KG); start offsets are bounded
    // by the packing layout
    // between(): a NEGATIVE start from a corrupt upstream row would pack into
    // the long's high bits and silently corrupt sort order + dedup — it must
    // hit the same loud raise_error as an oversized one (ADVICE r4)
    val startChecked = when(col("start").between(0, MaxPackedStart - 1), col("start"))
      .otherwise(raise_error(concat(
        lit(s"Triples.runEncoded: start outside [0, $MaxPackedStart) in "),
        col("conv_id"))).cast("int"))
    // same loud-failure rule for turn_idx: the sorted-exchange variant packs
    // (chunk, turn) into one long whose order is only (chunk asc, turn asc)
    // for NON-NEGATIVE turns, so a corrupt negative index must abort, not
    // silently mis-sort
    val turnChecked = when(col("turn_idx") >= 0, col("turn_idx"))
      .otherwise(raise_error(concat(
        lit("Triples.runEncoded: negative turn_idx in "),
        col("conv_id"))).cast("int"))
    val lbChecked = coalesce(try_element_at(labelMap, col("label")),
      raise_error(concat(lit("Triples.runEncoded: label not in dict: "),
        col("label"))).cast("int"))
    val eidChecked = coalesce(col("_eid"),
      raise_error(concat(lit("Triples.runEncoded: canonical_id not in dict: "),
        col("canonical_id"))).cast("int"))
    canon
      .filter(col("canonical_id").isNotNull)
      .join(broadcast(eidDf), col("canonical_id") === col("_can"), "left")
      .select(convKey.as("_cid"), turnChecked.as("turn_idx"),
        (shiftleft(startChecked.cast("long"), 40) +
          shiftleft(lbChecked.cast("long"), 32) +
          eidChecked.cast("long")).as("_m"))
  }

  /** Dictionary-encoded variant of `run` — the pipeline's hot path. The
    * triple exchange is the measured shuffle-byte ceiling of the whole flow
    * (BENCH.md stage breakdown: ~75% of pipeline wall at 18.2M turns), and
    * what it ships per mention in the generic path is a struct of STRINGS
    * (label + canonical_id, ~40 B in UnsafeRow layout). Here each mention is
    * packed into ONE 64-bit long BEFORE the exchange:
    *
    *   [ start : 23 bits | labelRank : 8 bits | entityRank : 32 bits ]
    *
    * with ranks assigned in UTF-8 byte order (see `TripleDict`), so the
    * natural ascending long sort == the generic struct sort — outputs are
    * bit-identical (equivalence-tested in PipelineSpec). The entity encode
    * is a broadcast hash join against the rank dictionary (no shuffle of
    * the unbounded mention side); the label encode is a ≤256-entry map
    * literal; decode happens inside the emit flatMap via broadcast reverse
    * arrays — no decode joins, and emitted subj/obj strings are SHARED
    * references into the broadcast array (zero per-triple string
    * allocation, the at-scale fix for the emit hot loop).
    *
    * Same chunked-window skew-proofing as `run` (single shuffle exchange,
    * plan-asserted in PlansSpec).
    */
  def runEncoded(canon: Dataset[CanonMention], dict: TripleDict,
                 chunkTurns: Int = DefaultChunkTurns,
                 convCodec: Option[ConvCodec] = None,
                 prePack: Boolean = false): Dataset[Triple] = {
    require(chunkTurns >= 2, s"chunkTurns must be ≥ 2, got $chunkTurns")
    val spark = canon.sparkSession
    import spark.implicits._
    val packed = packedMentions(canon, dict, convCodec)

    // prePack=true groups locally-contiguous (key, turn) mention runs into
    // one Array[Long] row BEFORE the exchange (detect emits a turn's
    // mentions consecutively, so runs ≈ turns); the post-shuffle groupBy
    // merges the rare split-turn fragments with a flatten. Measured A/B at
    // 18.2M turns / 32c (graft.ExchangeAB, BENCH.md §Exchange): −55%
    // shuffle records (36.4M → 16.4M), −22% shuffle bytes (454 → 356 MB),
    // but +11% WALL on this single-host tmpfs-shuffle VM — the typed
    // mapPartitions boundary (codegen break + per-run Array[Long]
    // allocation) costs more than local shuffle I/O saves. Hence default
    // OFF here; on a NIC-bound multi-node cluster, where the exchange
    // crosses the network, the byte/record cut is the relevant currency —
    // enable it there. Both shapes reach emitPacked as array<long>,
    // unsorted (emitPacked's Arrays.sort restores the generic struct sort);
    // output is identical (equivalence-tested in PipelineSpec), and
    // correctness never depends on the clustering: a shuffled upstream
    // degrades to one-mention runs — the prePack=false exchange exactly.
    val grouped =
      if (!prePack) packed
      else convCodec match {
        case Some(_) => prePackRuns(packed.as[(Long, Int, Long)])
          .toDF("_cid", "turn_idx", "_m")
        case None => prePackRuns(packed.as[(String, Int, Long)])
          .toDF("_cid", "turn_idx", "_m")
      }
    val msAgg =
      if (prePack) flatten(collect_list(col("_m")))
      else collect_list(col("_m"))
    val withPrev = chunkedWithContext(grouped, chunkTurns, 1, msAgg)
    val getConv: org.apache.spark.sql.Row => String = convCodec match {
      case Some(cc) =>
        val dec = cc.decode
        r => dec(r.getLong(0))
      case None => _.getString(0)
    }
    emitPacked(withPrev, dict, getConv)(spark)
  }

  // bit layout of the single-long (chunk, turn-in-chunk) positions used by
  // the Packed32 and Hashed sorted exchanges: [hi:32 | chunk:15 | tic:17].
  // tic = turn − chunk·chunkTurns + depth, so context copies (tic < depth)
  // sort BEFORE their chunk's real rows; chunk < 2^15 — for BOTH the real
  // row's chunk and its overlap copy's chunk+1 — bounds one conversation at
  // chunkTurns·32768 − depth turns (all but the topmost k Int turn_idx
  // values at the default chunking), enforced loudly per row.
  private[graft] val TicBits = 17
  private[graft] val ChunkBits = 15
  private val TicMask = (1L << TicBits) - 1
  private val ChunkMask = (1L << ChunkBits) - 1

  /** Sorted-exchange variant of `runEncoded`: the same ONE hash exchange on
    * (conv key, chunk), but the per-turn grouping, the turn ordering AND the
    * depth-k cross-turn context all come from a single `sortWithinPartitions`
    * pass consumed by a streaming per-partition walker — no collect_list
    * buffers, no window lag columns, no `_ctx` byte on the wire, and no
    * per-turn `Arrays.sort` (the partition sort already delivers mentions
    * in packed order; bit 63 is always 0, so the signed long sort is the
    * unsigned / UTF-8-rank one). Context-ness is DERIVED in the walker
    * instead of shipped. Output is identical to `runEncoded`/`run`
    * (equivalence-tested in PipelineSpec); per-task memory is O(one turn)
    * plus a depth-k lag ring, strictly less than the collect_list path's
    * per-group buffers, and the post-shuffle sort is Spark's spill-safe
    * external sorter — arbitrarily large (key, chunk) groups degrade to
    * disk, never OOM. Measured fastest of the three exchange shapes at
    * 18.2M turns / 32c (min 8.54 s vs 11.54 s collect_list/window and
    * 12.02 s pre-pack, two A/B sessions — graft.ExchangeAB, BENCH.md
    * §Exchange), so this is the `Pipeline` default since round 5.
    *
    * Wire layouts by conv-key mode (UnsafeRow fixed bytes per mention row,
    * excluding the 8 B null bitmap word):
    *   - `ConvCodec(fits32 = true)`: (convKey32|chunk|tic packed long,
    *     mention long) — 2 columns, 16 B (round 6);
    *   - `ConvCodec` 64-bit: (key long, chunk<<32|turn long, mention long) —
    *     3 columns, 24 B;
    *   - no codec: (conv_id string, chunk<<32|turn, mention) — the exact
    *     string path; see `runEncodedSortedHashed` for the dictionary-free
    *     compressed-key alternative on UUID-keyed corpora.
    *
    * Cross-turn rule depth is the rule set's `depth` (the default rule set
    * is k=1, the deepest rule in the fixed pattern set); deeper rule sets
    * plug in via `runEncodedSortedRules` — the walker keeps a depth-k lag
    * ring (VERDICT r5 item 5).
    */
  def runEncodedSorted(canon: Dataset[CanonMention], dict: TripleDict,
                       chunkTurns: Int = DefaultChunkTurns,
                       convCodec: Option[ConvCodec] = None): Dataset[Triple] =
    runEncodedSortedRules(canon, dict, chunkTurns, convCodec, defaultRules(dict))

  /** Dictionary-free sorted exchange for corpora whose conv ids are NOT
    * numeric-derivable (UUIDs, opaque strings): instead of shipping the id
    * string on every mention row, the exchange carries a 96-bit hash of it
    * — xxhash64 plus the high 32 bits of an independently-seeded second
    * xxhash64, packed as (k1 long, [k2hi:32|chunk:15|tic:17] long, mention
    * long) — and the STRING rides a fourth, almost-always-null column
    * exactly once per map-side (conv, chunk) run (`markCarriers`), which
    * under the natural turn-contiguous layout is once per conversation per
    * chunk per input partition. The walker recovers the id from the
    * carrier; turns that sort before their group's first carrier (possible
    * only under adversarial input layouts) buffer their triples until it
    * arrives — bounded by one chunk.
    *
    * Correctness is NOT probabilistic-silent: 96 bits make an undetected
    * wrong-group merge require a (k1, k2hi, chunk) collision between two
    * conversations (expected ≈ 6e-6 such pairs at 10^12 conversations), and
    * even that case is caught LOUDLY — every carrier is validated against
    * the group's id and a mismatch aborts the job with a clear message
    * (rerun with the exact string path). Equivalence to `run` on UUID
    * corpora, including a pre-shuffled adversarial layout, is tested in
    * PipelineSpec.
    */
  def runEncodedSortedHashed(canon: Dataset[CanonMention], dict: TripleDict,
                             chunkTurns: Int = DefaultChunkTurns): Dataset[Triple] =
    runEncodedSortedHashedRules(canon, dict, chunkTurns, defaultRules(dict))

  /** The fixed pattern-rule set as a pluggable walker rule body (k = 1). */
  private[graft] def defaultRules(dict: TripleDict): PackedRules =
    new DefaultPackedRules(dict.rankOfLabel("PER"), dict.rankOfLabel("ORG"),
      dict.rankOfLabel("LOC"))

  private[graft] def runEncodedSortedRules(canon: Dataset[CanonMention],
      dict: TripleDict, chunkTurns: Int, convCodec: Option[ConvCodec],
      rules: PackedRules): Dataset[Triple] = {
    val k = rules.depth
    require(k >= 1 && chunkTurns > k,
      s"chunk size must exceed rule depth: chunkTurns=$chunkTurns depth=$k")
    val spark = canon.sparkSession
    import spark.implicits._
    val bcEnts = spark.sparkContext.broadcast(dict.entities)

    convCodec match {
      case Some(cc) if cc.fits32 =>
        require(chunkTurns.toLong + k <= (1L << TicBits),
          s"chunkTurns + depth must fit $TicBits tic bits: $chunkTurns + $k")
        val pm = packedMentions(canon, dict, convCodec)
        // fits32 is VERIFIED, not trusted: a key ≥ 2^32 would alias another
        // conversation's packed position — abort instead
        val cid32 = when(col("_cid").between(0L, (1L << 32) - 1), col("_cid"))
          .otherwise(raise_error(concat(
            lit("Triples: ConvCodec.fits32 violated (conv key ≥ 2^32): "),
            col("_cid").cast("string"))).cast("long"))
        // chunk must fit its 15 bits INCLUDING the overlap copy's chunk+1:
        // a context copy of the last chunk's final k turns would otherwise
        // compute chunk 2^15, whose shifted bits carry into the conv-key
        // field and leak the row into the NEXT key's chunk 0 as a phantom
        // negative turn. Bound: turn < chunkTurns·2^15 − k (all Int
        // turn_idx but the topmost k at the default chunking; loud on tiny
        // test chunk sizes)
        val turnOk = when(
            col("turn_idx") < lit((chunkTurns.toLong << ChunkBits) - k),
            col("turn_idx"))
          .otherwise(raise_error(concat(
            lit(s"Triples: turn_idx ≥ chunkTurns·2^$ChunkBits−$k in conv key "),
            col("_cid").cast("string"))).cast("int"))
        val chunk = floor(turnOk / chunkTurns).cast("long")
        val p = shiftleft(cid32, 32) + shiftleft(chunk, TicBits) +
          (turnOk - chunk * chunkTurns + k)
        val pNext = shiftleft(cid32, 32) + shiftleft(chunk + 1, TicBits) +
          (turnOk - (chunk + 1) * chunkTurns + k)
        val inOverlap = pmod(turnOk, lit(chunkTurns)) >= chunkTurns - k
        val dup = pm
          .withColumn("_p", explode(when(inOverlap, array(p, pNext))
            .otherwise(array(p))))
          .select(col("_p"), col("_m"))
          .toDF("_1", "_2")
        dup.as[(Long, Long)]
          .repartition(shiftrightunsigned(col("_1"), TicBits))
          .sortWithinPartitions("_1", "_2")
          .mapPartitions(walk(new Packed32Layout(cc.decode, chunkTurns, k),
            rules, bcEnts))

      case Some(cc) =>
        val dup = ctDup(packedMentions(canon, dict, convCodec), chunkTurns, k)
        dup.as[(Long, Long, Long)]
          .repartition(col("_1"), shiftright(col("_2"), 32))
          .sortWithinPartitions("_1", "_2", "_3")
          .mapPartitions(walk(new Codec64Layout(cc.decode, chunkTurns),
            rules, bcEnts))

      case None =>
        val dup = ctDup(packedMentions(canon, dict, None), chunkTurns, k)
        dup.as[(String, Long, Long)]
          .repartition(col("_1"), shiftright(col("_2"), 32))
          .sortWithinPartitions("_1", "_2", "_3")
          .mapPartitions(walk(new StringKeyLayout(chunkTurns), rules, bcEnts))
    }
  }

  /** (chunk<<32 | turn) packing + depth-k overlap duplication shared by the
    * Codec64 and string-key sorted paths: both halves non-negative (turn_idx
    * guarded loudly in packedMentions), so ascending `_ct` order is exactly
    * (chunk asc, turn asc) — one fewer sort column and 8 fewer bytes per
    * UnsafeRow than separate columns. The last k turns of each chunk are
    * also emitted into the next chunk as context copies.
    */
  private def ctDup(pm: DataFrame, chunkTurns: Int, k: Int): DataFrame = {
    val chunk = floor(col("turn_idx") / chunkTurns).cast("long")
    val ct = shiftleft(chunk, 32) + col("turn_idx")
    val ctNext = shiftleft(chunk + 1, 32) + col("turn_idx") // overlap copy
    val inOverlap = pmod(col("turn_idx"), lit(chunkTurns)) >= chunkTurns - k
    pm.withColumn("_ct", explode(when(inOverlap, array(ct, ctNext))
        .otherwise(array(ct))))
      .select(col("_cid"), col("_ct"), col("_m"))
      .toDF("_1", "_2", "_3")
  }

  private[graft] def runEncodedSortedHashedRules(canon: Dataset[CanonMention],
      dict: TripleDict, chunkTurns: Int, rules: PackedRules): Dataset[Triple] = {
    val k = rules.depth
    require(k >= 1 && chunkTurns > k,
      s"chunk size must exceed rule depth: chunkTurns=$chunkTurns depth=$k")
    require(chunkTurns.toLong + k <= (1L << TicBits),
      s"chunkTurns + depth must fit $TicBits tic bits: $chunkTurns + $k")
    val spark = canon.sparkSession
    import spark.implicits._
    val bcEnts = spark.sparkContext.broadcast(dict.entities)
    val pm = packedMentions(canon, dict, None)
    // same chunk+1-overflow-safe bound as the Packed32 layout (see there):
    // the overlap copy's chunk must also fit the 15-bit field, or its
    // shifted bits would carry into the k2hi hash field
    val turnOk = when(
        col("turn_idx") < lit((chunkTurns.toLong << ChunkBits) - k),
        col("turn_idx"))
      .otherwise(raise_error(concat(
        lit(s"Triples.runEncodedSortedHashed: turn_idx ≥ chunkTurns·2^$ChunkBits−$k in "),
        col("_cid"))).cast("int"))
    // two independently-derived hashes of the conv id (a second input column
    // changes the xxhash64 stream) — 96 bits of group identity on the wire
    val hashed = pm.select(col("_cid"), turnOk.as("_t"), col("_m"),
      xxhash64(col("_cid")).as("_k1"),
      shiftrightunsigned(xxhash64(col("_cid"), lit(0x9e3779b97f4a7c15L)), 32)
        .as("_k2hi"))
    hashed.as[(String, Int, Long, Long, Long)]
      .mapPartitions(markCarriers(chunkTurns, k))
      .toDF("_1", "_2", "_3", "_4").as[(Long, Long, Long, String)]
      .repartition(col("_1"), shiftrightunsigned(col("_2"), TicBits))
      .sortWithinPartitions("_1", "_2", "_3")
      .mapPartitions(walk(new HashedLayout(chunkTurns, k), rules, bcEnts))
  }

  /** Fused detect→packed sorted exchange — the pipeline's hot path since
    * round 7 (VERDICT r6 item 1). The round-6 1-core attribution showed
    * `Detect.run`'s full Spark path at 634k turns/s while the tagger alone
    * (`spanOne`) runs 1.1–1.2M: roughly half the detect wall was Row/encoder
    * plumbing — the 6-field string `Mention` Dataset serialized between
    * detect and `packedMentions`, plus three broadcast joins (alias link,
    * canon component, entity rank) whose probe tables are all deterministic
    * functions of (label, lower(surface)) for dictionary-linked mentions.
    *
    * This path composes those functions ONCE on the driver into a single
    * lookup (label, lower(surface)) → (labelRank<<32 | entityRank) and emits
    * the Packed32 wire rows (position long, mention long) STRAIGHT from the
    * tagger's span loop: the Mention/LinkedMention/CanonMention string rows
    * never exist, and the pre-exchange stage serializes two longs per
    * mention. Downstream (exchange, partition sort, streaming walker) is
    * byte-identical to `runEncodedSorted`'s fits32 branch.
    *
    * Semantics are EXACTLY the canonical chain's (equivalence-tested in
    * PipelineSpec against detect→link(exact)→canon→runEncodedSorted):
    *   - link: min(entity_id) per (lower(surface), label), misses → NIL —
    *     the LUT mirrors `Link.aliasNorm`'s groupBy-min under the same
    *     UTF-8 binary `min` and the engine's own `lower` (UTF8String);
    *   - canon: canonical = component-map(entity) else entity, via the SAME
    *     union-find election as `Canon.run` (`Canon.localCanonicalMap`);
    *   - NIL mentions emit nothing (the `canonical_id IS NOT NULL` filter);
    *   - every loud guard of the encoded path is kept per emitted mention:
    *     convEncode failure, fits32 violation, negative turn, chunk+1
    *     overflow at the 15-bit boundary, start outside [0, 2^23).
    *
    * The fusion premise — alias dictionary and same-as component map are
    * driver/broadcast-sized — is the SAME premise the canonical chain's
    * broadcast joins already rely on (`Link` broadcasts the dictionary,
    * `Canon.run` gates its broadcast at 2M entities); the `TripleDict`
    * entity gate (`MaxEntities`) bounds the third structure. The generic
    * `run` remains the fallback for corpora beyond any of those bounds.
    *
    * The non-fused stages (`Detect.run`, `Link.run`, `Canon.run`) remain
    * the API for consumers that need the mention-level relations — the
    * snapshot flow and the q21/q22/q36 query surfaces use them unchanged.
    */
  def runFusedDetect(turns: Dataset[Turn],
      tagger: org.apache.spark.broadcast.Broadcast[MentionTagger],
      alias: Seq[AliasRow], sameAsPairs: Seq[(String, String)],
      dict: TripleDict, convEncode: String => Long, convDecode: Long => String,
      chunkTurns: Int = DefaultChunkTurns): Dataset[Triple] = {
    val rules = defaultRules(dict)
    val k = rules.depth
    require(k >= 1 && chunkTurns > k,
      s"chunk size must exceed rule depth: chunkTurns=$chunkTurns depth=$k")
    require(chunkTurns.toLong + k <= (1L << TicBits),
      s"chunkTurns + depth must fit $TicBits tic bits: $chunkTurns + $k")
    val spark = turns.sparkSession
    import spark.implicits._
    val bcEnts = spark.sparkContext.broadcast(dict.entities)
    val bcLut = spark.sparkContext.broadcast(fusedLut(alias, sameAsPairs, dict))
    val m = chunkTurns
    val maxTurn = (m.toLong << ChunkBits) - k
    turns.mapPartitions { it =>
      val tg = tagger.value
      val lut = bcLut.value
      Detect.spanPartition(it, tg).flatMap { case (turn, spans) =>
        // probe spans first: guards fire per EMITTED mention, exactly like
        // packedMentions' post-filter raise_errors (an all-NIL turn guards
        // nothing there either)
        var ms: Array[Long] = null
        var n = 0
        var sp = spans
        while (sp.nonEmpty) {
          val s = sp.head
          val v = lut.get(s.label + "\u0000" + Link.lowerUtf8(s.surface))
          if (v != null) { // dictionary miss → NIL → no triple source
            if (s.start < 0 || s.start >= MaxPackedStart)
              throw new IllegalStateException(
                s"Triples.runEncoded: start outside [0, $MaxPackedStart) in ${turn.conv_id}")
            if (ms == null) ms = new Array[Long](4)
            else if (n == ms.length) ms = java.util.Arrays.copyOf(ms, n * 2)
            ms(n) = (s.start.toLong << 40) | v.longValue()
            n += 1
          }
          sp = sp.tail
        }
        if (n == 0) Iterator.empty
        else {
          val cid = convEncode(turn.conv_id) // loud on unparsable ids
          if (cid < 0L || cid > 0xffffffffL) throw new IllegalStateException(
            s"Triples: ConvCodec.fits32 violated (conv key ≥ 2^32): $cid")
          val t = turn.turn_idx
          if (t < 0) throw new IllegalStateException(
            s"Triples.runEncoded: negative turn_idx in ${turn.conv_id}")
          if (t >= maxTurn) throw new IllegalStateException(
            s"Triples: turn_idx ≥ chunkTurns·2^$ChunkBits−$k in conv key $cid")
          val chunk = (t / m).toLong
          val keyHi = cid << 32
          val p = keyHi | (chunk << TicBits) | (t - chunk * m + k)
          val over = t % m >= m - k
          val out = new Array[(Long, Long)](if (over) n * 2 else n)
          var i = 0
          while (i < n) { out(i) = (p, ms(i)); i += 1 }
          if (over) {
            val c2 = chunk + 1
            val p2 = keyHi | (c2 << TicBits) | (t - c2 * m + k)
            while (i < 2 * n) { out(i) = (p2, ms(i - n)); i += 1 }
          }
          out.iterator
        }
      }
    }
      .repartition(shiftrightunsigned(col("_1"), TicBits))
      .sortWithinPartitions("_1", "_2")
      .mapPartitions(walk(new Packed32Layout(convDecode, chunkTurns, k),
        rules, bcEnts))
  }

  /** Driver-side composition of link ∘ canon ∘ rank-encode for the fused
    * path: `Link.aliasLut`'s (label + NUL + lower(surface)) → min-entity
    * election, canonicalized through `Canon.localCanonicalMap`'s union-find,
    * encoded to boxed (labelRank<<32 | entityRank). Builds loudly: a
    * canonical id or label outside `dict` fails HERE (construction) — the
    * same condition the encoded path's raise_error guards catch at runtime,
    * caught earlier.
    */
  private def fusedLut(alias: Seq[AliasRow], sameAsPairs: Seq[(String, String)],
                       dict: TripleDict): java.util.HashMap[String, java.lang.Long] = {
    val canonMap = Canon.localCanonicalMap(sameAsPairs)
    val entityRank: Map[String, Int] = dict.entities.zipWithIndex.toMap
    val lut = new java.util.HashMap[String, java.lang.Long](alias.size * 2)
    Link.aliasLut(alias).forEach { (key, entity) =>
      val canonical = canonMap.getOrElse(entity, entity)
      val label = key.substring(0, key.indexOf('\u0000'))
      val lb = dict.rankOfLabel(label)
      require(lb >= 0, s"Triples.runFusedDetect: label not in dict: $label")
      val eid = entityRank.getOrElse(canonical, -1)
      require(eid >= 0,
        s"Triples.runFusedDetect: canonical_id not in dict: $canonical")
      lut.put(key, java.lang.Long.valueOf((lb.toLong << 32) | eid.toLong))
    }
    lut
  }

  /** Map-side carrier marking + overlap duplication for the hashed sorted
    * exchange: a pure streaming pass (no buffering beyond one pending
    * context copy) turning (conv_id, turn, mention, k1, k2) rows into
    * (k1, [k2hi|chunk|tic], mention, carrier) rows, where `carrier` is the
    * conv_id string on the FIRST row of each locally-contiguous
    * (conv_id, chunk) run and null elsewhere. Every post-shuffle
    * (k1, k2hi, chunk) group therefore holds ≥ 1 carrier from each input
    * partition that feeds it — the invariant the walker's pending buffer
    * relies on. An adversarially interleaved input degrades to every row a
    * carrier (correct, just byte-heavier — exactly the string path).
    */
  private def markCarriers(m: Int, k: Int)
      : Iterator[(String, Int, Long, Long, Long)] => Iterator[(Long, Long, Long, String)] = { it =>
    new Iterator[(Long, Long, Long, String)] {
      private var runCid: String = null
      private var chunksSeen = new Array[Int](4) // chunks carried in this run
      private var nChunks = 0
      private var extra: (Long, Long, Long, String) = null
      private def carrierFor(cid: String, chunk: Int): Boolean = {
        if (cid != runCid) { runCid = cid; nChunks = 0 }
        var i = 0
        while (i < nChunks) { if (chunksSeen(i) == chunk) return false; i += 1 }
        if (nChunks == chunksSeen.length)
          chunksSeen = java.util.Arrays.copyOf(chunksSeen, nChunks * 2)
        chunksSeen(nChunks) = chunk; nChunks += 1
        true
      }
      def hasNext: Boolean = extra != null || it.hasNext
      def next(): (Long, Long, Long, String) = {
        if (extra != null) { val e = extra; extra = null; return e }
        val (cid, t, men, k1, k2hi) = it.next()
        val chunk = t / m
        val hi = k2hi << 32
        val p2 = hi | (chunk.toLong << TicBits) | (t - chunk.toLong * m + k)
        val car1 = carrierFor(cid, chunk)
        if (t % m >= m - k) {
          val c2 = chunk + 1
          val p2b = hi | (c2.toLong << TicBits) | (t - c2.toLong * m + k)
          val car2 = carrierFor(cid, c2)
          extra = (k1, p2b, men, if (car2) cid else null)
        }
        (k1, p2, men, if (car1) cid else null)
      }
    }
  }

  /** Row-shape adapter for the shared sorted walker. Rows arrive sorted so
    * that all of one (conversation, chunk) group is contiguous, turns
    * ascending within it with context copies first. Implementations must
    * make `sameTurn` imply `sameGroup` imply `sameConv`.
    */
  private trait WalkerLayout[R] extends Serializable {
    def sameGroup(a: R, b: R): Boolean
    def sameConv(a: R, b: R): Boolean
    def sameTurn(a: R, b: R): Boolean
    def turnIdx(r: R): Int
    def isContext(r: R): Boolean
    def mention(r: R): Long
    /** conversation id carried by this row — null on hashed non-carrier rows. */
    def convId(r: R): String
    /** true when only SOME rows carry the id (hashed layout): the walker
      * then validates every carrier against the group's id (loud collision
      * detection) and buffers pre-carrier turns.
      */
    def carriersSparse: Boolean
  }

  private final class Codec64Layout(decode: Long => String, chunkTurns: Int)
      extends WalkerLayout[(Long, Long, Long)] {
    def sameGroup(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._1 == b._1 && (a._2 >>> 32) == (b._2 >>> 32)
    def sameConv(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean = a._1 == b._1
    def sameTurn(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._1 == b._1 && a._2 == b._2
    def turnIdx(r: (Long, Long, Long)): Int = r._2.toInt
    def isContext(r: (Long, Long, Long)): Boolean =
      r._2.toInt / chunkTurns != (r._2 >>> 32).toInt
    def mention(r: (Long, Long, Long)): Long = r._3
    def convId(r: (Long, Long, Long)): String = decode(r._1)
    val carriersSparse = false
  }

  private final class StringKeyLayout(chunkTurns: Int)
      extends WalkerLayout[(String, Long, Long)] {
    def sameGroup(a: (String, Long, Long), b: (String, Long, Long)): Boolean =
      (a._2 >>> 32) == (b._2 >>> 32) && a._1 == b._1
    def sameConv(a: (String, Long, Long), b: (String, Long, Long)): Boolean =
      a._1 == b._1
    def sameTurn(a: (String, Long, Long), b: (String, Long, Long)): Boolean =
      a._2 == b._2 && a._1 == b._1
    def turnIdx(r: (String, Long, Long)): Int = r._2.toInt
    def isContext(r: (String, Long, Long)): Boolean =
      r._2.toInt / chunkTurns != (r._2 >>> 32).toInt
    def mention(r: (String, Long, Long)): Long = r._3
    def convId(r: (String, Long, Long)): String = r._1
    val carriersSparse = false
  }

  private final class Packed32Layout(decode: Long => String, chunkTurns: Int,
                                     k: Int) extends WalkerLayout[(Long, Long)] {
    def sameGroup(a: (Long, Long), b: (Long, Long)): Boolean =
      (a._1 >>> TicBits) == (b._1 >>> TicBits)
    def sameConv(a: (Long, Long), b: (Long, Long)): Boolean =
      (a._1 >>> 32) == (b._1 >>> 32)
    def sameTurn(a: (Long, Long), b: (Long, Long)): Boolean = a._1 == b._1
    def turnIdx(r: (Long, Long)): Int =
      ((r._1 >>> TicBits) & ChunkMask).toInt * chunkTurns +
        (r._1 & TicMask).toInt - k
    def isContext(r: (Long, Long)): Boolean = (r._1 & TicMask) < k
    def mention(r: (Long, Long)): Long = r._2
    def convId(r: (Long, Long)): String = decode(r._1 >>> 32)
    val carriersSparse = false
  }

  private final class HashedLayout(chunkTurns: Int, k: Int)
      extends WalkerLayout[(Long, Long, Long, String)] {
    def sameGroup(a: (Long, Long, Long, String), b: (Long, Long, Long, String)): Boolean =
      a._1 == b._1 && (a._2 >>> TicBits) == (b._2 >>> TicBits)
    def sameConv(a: (Long, Long, Long, String), b: (Long, Long, Long, String)): Boolean =
      a._1 == b._1 && (a._2 >>> 32) == (b._2 >>> 32)
    def sameTurn(a: (Long, Long, Long, String), b: (Long, Long, Long, String)): Boolean =
      a._1 == b._1 && a._2 == b._2
    def turnIdx(r: (Long, Long, Long, String)): Int =
      ((r._2 >>> TicBits) & ChunkMask).toInt * chunkTurns +
        (r._2 & TicMask).toInt - k
    def isContext(r: (Long, Long, Long, String)): Boolean = (r._2 & TicMask) < k
    def mention(r: (Long, Long, Long, String)): Long = r._3
    def convId(r: (Long, Long, Long, String)): String = r._4
    val carriersSparse = true
  }

  /** The per-partition streaming walker behind all sorted-exchange variants:
    * accumulate one turn's mentions in a growable scratch array; on turn
    * change emit its triples via the rule set (skipped for context copies)
    * and roll the array into the depth-k lag ring (array swap, no
    * allocation). The ring resets on every (conversation, chunk) edge, so
    * context never leaks across conversations or chunks. For sparse-carrier
    * layouts the walker additionally recovers the conversation id from
    * carrier rows, validates every carrier against the group's id (loud
    * hash-collision detection), and buffers turns that flush before the
    * group's first carrier (adversarial layouts only; bounded by one
    * chunk's triples — the markCarriers invariant guarantees a carrier per
    * group).
    */
  private def walk[R](ly: WalkerLayout[R], rules: PackedRules,
      bcEnts: org.apache.spark.broadcast.Broadcast[Array[String]])
      : Iterator[R] => Iterator[Triple] = { it =>
    // unsafeWrapArray ONCE per partition: the bare Array would otherwise hit
    // the implicit copying Array→IndexedSeq conversion on EVERY rules.emit
    // call — a full copy of the entity dictionary per turn
    val ents: IndexedSeq[String] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bcEnts.value)
    val dedup = new PairDedup
    new Iterator[Triple] {
      private val out = new scala.collection.mutable.ArrayBuffer[Triple]()
      private var outIdx = 0
      private val ring = new LagRing(rules.depth)
      private var curArr = new Array[Long](8)
      private var curLen = 0
      private var curRow: R = _
      private var haveCur = false
      private var convId: String = null
      private var pending: scala.collection.mutable.ArrayBuffer[Triple] = null

      private def append(m: Long): Unit = {
        if (curLen == curArr.length) curArr = java.util.Arrays.copyOf(curArr, curLen * 2)
        curArr(curLen) = m
        curLen += 1
      }
      private def noteConv(r: R): Unit = {
        if (convId == null) {
          val s = ly.convId(r)
          if (s != null) {
            convId = s
            if (pending != null && pending.nonEmpty) {
              var i = 0
              while (i < pending.length) { out += pending(i).copy(conv_id = s); i += 1 }
              pending.clear()
            }
          }
        } else if (ly.carriersSparse) {
          val s = ly.convId(r)
          if (s != null && s != convId) throw new IllegalStateException(
            s"Triples.runEncodedSortedHashed: conv-id hash collision in one exchange " +
              s"group ('$convId' vs '$s') — rerun with the exact string-keyed path")
        }
      }
      private def flushTurn(): Unit = {
        val t = ly.turnIdx(curRow)
        if (!ly.isContext(curRow)) {
          if (convId != null) rules.emit(curArr, curLen, ring, convId, t, ents, dedup, out)
          else {
            if (pending == null) pending = new scala.collection.mutable.ArrayBuffer[Triple]()
            rules.emit(curArr, curLen, ring, null, t, ents, dedup, pending)
          }
        }
        curArr = ring.push(t, curArr, curLen)
        curLen = 0
      }
      private def endGroup(): Unit = {
        if (pending != null && pending.nonEmpty) throw new IllegalStateException(
          "Triples sorted walker: exchange group ended with no conversation-id " +
            "carrier — markCarriers invariant violated")
        ring.reset()
      }
      private def advance(): Unit = {
        if (outIdx < out.length) return
        out.clear(); outIdx = 0
        while (out.isEmpty && (haveCur || it.hasNext)) {
          if (!it.hasNext) { // final accumulated turn
            flushTurn()
            endGroup()
            haveCur = false
          } else {
            val r = it.next()
            if (!haveCur) {
              curRow = r; haveCur = true
              noteConv(r)
              append(ly.mention(r))
            } else if (ly.sameTurn(curRow, r)) {
              noteConv(r)
              append(ly.mention(r))
            } else {
              flushTurn()
              if (!ly.sameGroup(curRow, r)) {
                endGroup()
                if (!ly.sameConv(curRow, r)) convId = null
              }
              curRow = r
              noteConv(r)
              append(ly.mention(r))
            }
          }
        }
      }
      def hasNext: Boolean = { advance(); outIdx < out.length }
      def next(): Triple = {
        advance()
        if (outIdx >= out.length) throw new NoSuchElementException("empty walker")
        val t = out(outIdx); outIdx += 1; t
      }
    }
  }

  /** Depth-k ring of (turnIdx, sorted packed mentions) lag slots for the
    * sorted walker — the k-generalized form of round 5's single lag slot.
    * Lookup is by ABSOLUTE turn index (`msAt(turnIdx - d)`), so sparse turn
    * indices behave exactly like the window path's `prev_idx == turn_idx−d`
    * checks; a missing turn yields (EmptyLongs, 0).
    */
  private[graft] final class LagRing(val depth: Int) {
    private val turns = Array.fill(depth)(Int.MinValue)
    private val arrs = Array.fill(depth)(new Array[Long](8))
    private val lens = new Array[Int](depth)
    private var pos = 0
    def reset(): Unit = {
      var i = 0
      while (i < depth) { turns(i) = Int.MinValue; i += 1 }
    }
    /** Record `turn`'s mentions; returns the evicted slot's array for reuse
      * as the caller's next accumulation buffer (swap, no allocation).
      */
    def push(turn: Int, arr: Array[Long], len: Int): Array[Long] = {
      val evicted = arrs(pos)
      arrs(pos) = arr; lens(pos) = len; turns(pos) = turn
      pos += 1; if (pos == depth) pos = 0
      evicted
    }
    def msAt(turn: Int): Array[Long] = {
      var i = 0
      while (i < depth) { if (turns(i) == turn) return arrs(i); i += 1 }
      EmptyLongs
    }
    def lenAt(turn: Int): Int = {
      var i = 0
      while (i < depth) { if (turns(i) == turn) return lens(i); i += 1 }
      0
    }
  }

  /** Pluggable rule body for the sorted walker: emit turn `turnIdx`'s
    * triples given its sorted packed mentions and the depth-k lag ring of
    * preceding turns. `depth` is the deepest cross-turn distance the rules
    * consult — it sizes the ring AND the chunk-overlap duplication.
    * `convId` may be null for turns buffered before a sparse-carrier
    * group's id is known; the walker patches it on release.
    */
  private[graft] trait PackedRules extends Serializable {
    def depth: Int
    def emit(ms: Array[Long], msLen: Int, ring: LagRing, convId: String,
             turnIdx: Int, ents: IndexedSeq[String], dedup: PairDedup,
             out: scala.collection.mutable.ArrayBuffer[Triple]): Unit
  }

  private[graft] final class DefaultPackedRules(perB: Int, orgB: Int, locB: Int)
      extends PackedRules {
    val depth = 1
    def emit(ms: Array[Long], msLen: Int, ring: LagRing, convId: String,
             turnIdx: Int, ents: IndexedSeq[String], dedup: PairDedup,
             out: scala.collection.mutable.ArrayBuffer[Triple]): Unit =
      emitTurnRules(ms, msLen, ring.msAt(turnIdx - 1), ring.lenAt(turnIdx - 1),
        convId, turnIdx, ents, perB, orgB, locB, dedup, out)
  }

  /** Run-length grouping of consecutive (key, turn) mention rows into one
    * (key, turn, Array[Long]) row — the map-side pre-pack of the encoded
    * exchange. Pure narrow streaming pass: one element of lookahead, no
    * per-partition buffering beyond the current turn's (text-length-bounded)
    * mention array, so it composes with arbitrarily large partitions.
    */
  private def prePackRuns[K](ds: Dataset[(K, Int, Long)])(
      implicit enc: org.apache.spark.sql.Encoder[(K, Int, Array[Long])])
      : Dataset[(K, Int, Array[Long])] =
    ds.mapPartitions { it =>
      new Iterator[(K, Int, Array[Long])] {
        private var pending: (K, Int, Long) = _
        private var hasPending = false
        def hasNext: Boolean = hasPending || it.hasNext
        def next(): (K, Int, Array[Long]) = {
          var cur = if (hasPending) { hasPending = false; pending } else it.next()
          val cid = cur._1
          val turn = cur._2
          var arr = new Array[Long](4)
          arr(0) = cur._3
          var n = 1
          var open = true
          while (open && it.hasNext) {
            cur = it.next()
            if (cur._1 == cid && cur._2 == turn) {
              if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
              arr(n) = cur._3; n += 1
            } else { pending = cur; hasPending = true; open = false }
          }
          (cid, turn, if (n == arr.length) arr else java.util.Arrays.copyOf(arr, n))
        }
      }
    }

  /** Growable long array with linear-scan dedup — per-turn triple counts are
    * tiny, so a scan beats any hash set and allocates nothing per element
    * (no boxing). Reset per row via `clear()`.
    */
  private[graft] final class PairDedup {
    private var keys = new Array[Long](16)
    private var n = 0
    def clear(): Unit = n = 0
    /** true iff key was not seen before (and is now recorded). */
    def add(key: Long): Boolean = {
      var i = 0
      while (i < n) { if (keys(i) == key) return false; i += 1 }
      if (n == keys.length) keys = java.util.Arrays.copyOf(keys, n * 2)
      keys(n) = key; n += 1; true
    }
  }

  private[graft] val EmptyLongs = Array.empty[Long]

  /** Zero-copy unwrap of a Row's long-array column. PINNED ASSUMPTION: the
    * caller (`emitPacked`) sorts the returned array IN PLACE, which is safe
    * only because Spark's row deserializer materializes a FRESH primitive
    * array per `getSeq` call per row (GenericRowWithSchema over a copied
    * UnsafeArrayData) — nothing else aliases it. If a future Spark version
    * ever serves a shared/reused buffer here (e.g. a columnar row path),
    * switch the `emitPacked` call sites to `longArrayCopy` (ADVICE r5 low).
    * The equivalence suite (PipelineSpec: runEncoded ≡ run) would catch the
    * resulting corruption — sibling reads of a mutated row mis-sort turns.
    */
  private def longArray(s: Seq[Long]): Array[Long] = (s: Any) match {
    case a: scala.collection.immutable.ArraySeq.ofLong => a.unsafeArray
    case a: scala.collection.mutable.ArraySeq.ofLong => a.array
    case other: Seq[_] =>
      longArrayCopy(other.asInstanceOf[Seq[Long]])
  }

  private def longArrayCopy(other: Seq[Long]): Array[Long] = {
      val n = other.length
      val out = new Array[Long](n)
      var i = 0
      val it = other.iterator
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
  }

  /** Packed-path emit: identical rule bodies to `emit`/`withinTurnTriples`/
    * `followUps` but evaluated on the packed longs — label compare is an int
    * compare, pair dedup is a packed (pred, subj, obj) long key, and subj/obj
    * decode is an index into the broadcast entity array (shared string refs,
    * no per-triple allocation beyond the output `Triple` itself).
    * The per-turn arrays arrive as UNSORTED flatten-concats of the map-side
    * pre-pack runs; `Arrays.sort` here restores exactly the generic path's
    * struct sort (rank packing preserves UTF-8 order, and bit 63 is always 0
    * — start < 2^23 — so the signed long sort is the unsigned one).
    * Equivalence to the generic path is property-tested (PipelineSpec).
    */
  private def emitPacked(withPrev: DataFrame, dict: TripleDict,
                         getConv: org.apache.spark.sql.Row => String)
                        (spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    val bcEnts = spark.sparkContext.broadcast(dict.entities)
    // rule-label ranks resolved once on the driver; -1 (absent from this
    // corpus' label vocabulary) simply never matches
    val perB = dict.rankOfLabel("PER")
    val orgB = dict.rankOfLabel("ORG")
    val locB = dict.rankOfLabel("LOC")
    withPrev.mapPartitions { rows =>
      // unsafeWrapArray ONCE per partition: the bare Array would otherwise
      // hit the implicit copying Array→IndexedSeq conversion on EVERY
      // emitTurnRules call — a full copy of the entity dictionary per turn
      val ents: IndexedSeq[String] =
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bcEnts.value)
      val dedup = new PairDedup
      val out = new scala.collection.mutable.ArrayBuffer[Triple]()
      rows.flatMap { row =>
        val convId = getConv(row)
        val turnIdx = row.getInt(1)
        val ms = longArray(row.getSeq[Long](2))
        java.util.Arrays.sort(ms)
        val prevAdjacent = !row.isNullAt(3) && row.getInt(3) == turnIdx - 1
        val prev =
          if (prevAdjacent && !row.isNullAt(4)) longArray(row.getSeq[Long](4))
          else EmptyLongs
        java.util.Arrays.sort(prev)

        out.clear()
        emitTurnRules(ms, ms.length, prev, prev.length, convId, turnIdx,
          ents, perB, orgB, locB, dedup, out)
        // out is reused across rows: copy the emitted slice (List avoids
        // retaining the buffer's backing array)
        out.toList
      }
    }
  }

  /** The four pattern-rule loops over one turn's SORTED packed mentions
    * (`ms(0 until msLen)`) with the adjacent previous turn's sorted packed
    * mentions (`prev(0 until prevLen)`, length 0 when none) — the ONE
    * implementation behind `emitPacked` (collect_list arrays) and the
    * sorted-exchange walker (growable scratch arrays; hence explicit
    * lengths). Appends to `out`; per-turn dedup via `dedup` (cleared here).
    * Rule order mirrors withinTurnTriples ++ followUps exactly.
    */
  private[graft] def emitTurnRules(ms: Array[Long], msLen: Int,
                            prev: Array[Long], prevLen: Int,
                            convId: String, turnIdx: Int,
                            ents: IndexedSeq[String],
                            perB: Int, orgB: Int, locB: Int,
                            dedup: PairDedup,
                            out: scala.collection.mutable.ArrayBuffer[Triple]): Unit = {
    dedup.clear()
    @inline def lbOf(v: Long): Int = ((v >>> 32) & 0xff).toInt
    @inline def eidOf(v: Long): Int = (v & 0xffffffffL).toInt
    def emitT(predId: Int, pred: String, s: Int, o: Int): Unit = {
      val key = (predId.toLong << 62) | (s.toLong << 31) | o.toLong
      if (dedup.add(key)) out += Triple(ents(s), pred, ents(o), convId, turnIdx)
    }
    var i = 0
    while (i < msLen) { // PER × ORG → affiliated_with
      if (lbOf(ms(i)) == perB) {
        var j = 0
        while (j < msLen) {
          if (lbOf(ms(j)) == orgB) emitT(0, "affiliated_with", eidOf(ms(i)), eidOf(ms(j)))
          j += 1
        }
      }
      i += 1
    }
    i = 0
    while (i < msLen) { // PER × PER (i<j, distinct ids) → mentions_with
      if (lbOf(ms(i)) == perB) {
        var j = i + 1
        while (j < msLen) {
          if (lbOf(ms(j)) == perB && eidOf(ms(i)) != eidOf(ms(j)))
            emitT(1, "mentions_with", eidOf(ms(i)), eidOf(ms(j)))
          j += 1
        }
      }
      i += 1
    }
    i = 0
    while (i < msLen) { // ORG × LOC → located_in
      if (lbOf(ms(i)) == orgB) {
        var j = 0
        while (j < msLen) {
          if (lbOf(ms(j)) == locB) emitT(2, "located_in", eidOf(ms(i)), eidOf(ms(j)))
          j += 1
        }
      }
      i += 1
    }
    i = 0
    while (i < msLen) { // PER(t) × PER(t−1), distinct ids → follows_up
      if (lbOf(ms(i)) == perB) {
        var j = 0
        while (j < prevLen) {
          if (lbOf(prev(j)) == perB && eidOf(ms(i)) != eidOf(prev(j)))
            emitT(3, "follows_up", eidOf(ms(i)), eidOf(prev(j)))
          j += 1
        }
      }
      i += 1
    }
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

  /** Within-turn mention ordering for streaming consumers — EXACTLY the
    * batch path's `sort_array` over struct(start, label, canonical_id):
    * Int ascending, then UTF-8 binary collation on the strings (a plain
    * Java-String sort would diverge on supplementary-plane ids, the same
    * hazard `TripleDict.utf8Order` exists for). A start-only sort would
    * leave start-ties in groupBy arrival order — nondeterministic across
    * replays, breaking streaming≡batch.
    */
  private[graft] val mentionKeyOrder: Ordering[(Int, String, String)] =
    new Ordering[(Int, String, String)] {
      def compare(a: (Int, String, String), b: (Int, String, String)): Int = {
        val c0 = java.lang.Integer.compare(a._1, b._1)
        if (c0 != 0) return c0
        val c1 = TripleDict.utf8Order.compare(a._2, b._2)
        if (c1 != 0) return c1
        TripleDict.utf8Order.compare(a._3, b._3)
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
