package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.synth.Transcripts.mix

/** Weak-labeling / data-augmentation operators (SURVEY.md §2.8) plus the
  * dictionary-building joins of §2.3 that aren't part of the linking stage.
  */
object Augment {

  /** label → length → surfaces index for same-label same-length replacement
    * sampling (`CC/loaders/utils/label_collections.py:63-95`): built as a
    * relational aggregate, collected + broadcast (dictionary-sized).
    *
    * @param maxPool cap on surfaces kept per (label, len) key — bounds BOTH
    *        the aggregation buffer and the driver collect. Over a web-scale
    *        mention table an uncapped `collect_set(surface)` is unbounded
    *        (driver OOM). The cap is applied BEFORE any list materializes:
    *        distinct → spill-able window rank → filter → collect_list over
    *        ≤ maxPool rows per key. The lexicographically-first `maxPool`
    *        surfaces are a deterministic sample.
    */
  def labelCollection(mentions: DataFrame, maxPool: Int = 10000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"), col("len")).orderBy(col("surface"))
    mentions.select(col("label"), length(col("surface")).as("len"), col("surface"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxPool)
      .groupBy(col("label"), col("len"))
      .agg(sort_array(collect_list(col("surface"))).as("surfaces"))
  }

  /** Entity-replacement expansion (`tools/expand_data.py:56-111`): for each
    * turn with mentions, emit up to `rate` extra copies where every gold
    * span is replaced by a seeded-random same-label same-length surface.
    * Deviation from the reference recorded in SURVEY §7.4: the reference
    * draws from a global RNG; we key every draw on
    * `hash(conv_id, turn_idx, attempt, span)` so the expansion is
    * deterministic under any partitioning. Provenance is kept per
    * replacement (origin surface + offsets), mirroring the reference's
    * `replace` records (expand_data.py:94-100).
    */
  def expandByReplacement(turns: Dataset[Turn], mentions0: DataFrame,
                          copies: Int = 1, maxPool: Int = 10000): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._

    // mentions feeds TWO consumers (the pool collect below and the per-turn
    // aggregate in the returned plan) — persist so an expensive upstream
    // lineage (detect over the corpus) runs once, not twice. The persist is
    // RELEASED before returning: the per-turn aggregate is eagerly
    // local-checkpointed (so the returned plan no longer references
    // `mentions` at all), which lets us unpersist here instead of leaking
    // cached blocks into long-lived caller sessions (checkpoint blocks are
    // reclaimed by the ContextCleaner once the returned plan is GC'd).
    val mentions = mentions0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // NOTE localCheckpoint blocks are executor-local (no replication): on a
    // real cluster an executor loss after this returns invalidates the plan
    // — acceptable for a derived augmentation (recompute on failure); a
    // production pipeline would materialize to a reliable table instead.
    // Eager also means construction runs one job up front by design (the
    // pool collect below needs the same lineage anyway).
    val perTurn = mentions.groupBy(col("conv_id"), col("turn_idx"))
      .agg(sort_array(collect_list(struct(col("start"), col("end"),
        col("label"), col("surface")))).as("ms"))
      .localCheckpoint(true) // eager: materializes `mentions` into the cache

    val coll = labelCollection(mentions, maxPool).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getSeq[String](2).toVector).toMap
    val collB = spark.sparkContext.broadcast(coll)
    mentions.unpersist(false)

    turns.toDF().join(perTurn, Seq("conv_id", "turn_idx"))
      .flatMap { row =>
        // by-name access: positional indices silently re-bind if Turn's
        // field order ever evolves
        val convId = row.getAs[String]("conv_id")
        val turnIdx = row.getAs[Int]("turn_idx")
        val text = row.getAs[String]("text")
        val ms = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("ms"))
          .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
        expandOne(convId, turnIdx, text, ms, collB.value, copies)
      }.toDF("conv_id", "turn_idx", "attempt", "text", "provenance")
  }

  /** The ONE expansion body shared by `expandByReplacement` and
    * `expandDetected`: `ms` must be the turn's mentions in the batch
    * sort_array order (ascending (start, end, label, surface)).
    */
  private def expandOne(convId: String, turnIdx: Int, text: String,
      ms: Seq[(Int, Int, String, String)],
      dict: Map[(String, Int), Vector[String]],
      copies: Int): Iterator[(String, Int, Int, String, Seq[String])] =
    (1 to copies).iterator.flatMap { attempt =>
      val sb = new StringBuilder
      var last = 0
      var changed = false
      val prov = scala.collection.mutable.ListBuffer.empty[(Int, Int, String)]
      for (((start, end, label, surface), k) <- ms.zipWithIndex) {
        // mentions from arbitrary sources may overlap (Detect's never
        // do); an overlapping span cannot be spliced into the rebuilt
        // text — skip it rather than corrupt offsets or crash
        if (start >= last) {
          sb.append(text.substring(last, start))
          // pool key uses CODEPOINT length — labelCollection buckets by
          // SQL length() (codepoints, = Python len()); String.length is
          // UTF-16 units and diverges on non-BMP chars
          val pool = dict.getOrElse(
            (label, surface.codePointCount(0, surface.length)), Vector(surface))
          val pick = pool((((mix(convId.hashCode.toLong ^ (turnIdx.toLong << 20)
            ^ (attempt.toLong << 40) ^ k.toLong) >>> 1) % pool.length).toInt))
          if (pick != surface) changed = true
          prov += ((sb.length, sb.length + pick.length, surface))
          sb.append(pick)
          last = end
        }
      }
      sb.append(text.substring(last))
      // reference dedups replacements identical to the origin
      // (expand_data.py:102-109 "except" semantics)
      if (changed)
        Some((convId, turnIdx, attempt, sb.result(),
          prov.toSeq.map(p => s"${p._1}:${p._2}<-${p._3}")))
      else None
    }

  /** Fused expansion (round 7): identical output to
    * `expandByReplacement(turns, Detect.run(turns, tagger), copies, maxPool)`
    * — equivalence-tested in AugmentSpec — but the per-turn mention lists
    * come straight from the tagger (`Detect.spanPartition`), so the mention
    * shuffle, the turns⋈perTurn join, the persist and the eager checkpoint
    * all drop out of the plan. Detection runs twice (once feeding the pool
    * aggregate, once in the expansion pass); measured cheaper than
    * materializing + shuffling + joining the mention relation. Ordering
    * equivalence: detect spans are non-overlapping, so ascending start (the
    * tagger's emission order) IS the batch `sort_array` order the seeded
    * per-mention draw index `k` depends on.
    */
  def expandDetected(turns: Dataset[Turn],
      tagger: org.apache.spark.broadcast.Broadcast[graft.stages.MentionTagger],
      copies: Int = 1, maxPool: Int = 10000): DataFrame = {
    val spark = turns.sparkSession
    import spark.implicits._
    val pools = turns.mapPartitions { it =>
      graft.stages.Detect.spanPartition(it, tagger.value).flatMap {
        case (_, spans) => spans.iterator.map(sp => (sp.label, sp.surface))
      }
    }.toDF("label", "surface")
    val coll = labelCollection(pools, maxPool).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getSeq[String](2).toVector).toMap
    val collB = spark.sparkContext.broadcast(coll)
    turns.mapPartitions { it =>
      val dict = collB.value
      graft.stages.Detect.spanPartition(it, tagger.value).flatMap {
        case (turn, spans) =>
          if (spans.isEmpty) Iterator.empty
          else expandOne(turn.conv_id, turn.turn_idx, turn.text,
            spans.map(sp => (sp.start, sp.end, sp.label, sp.surface)), dict, copies)
      }
    }.toDF("conv_id", "turn_idx", "attempt", "text", "provenance")
  }

  /** Self-labeling of a vocabulary (`t1.py:154-175`): run the mention
    * tagger over each vocab word as if it were a tiny document, emit
    * `(word, tags)` — the bootstrap that produces the alias dictionary.
    */
  def selfLabelVocab(spark: SparkSession, words: DataFrame,
                     tagger: org.apache.spark.broadcast.Broadcast[graft.stages.MentionTagger]): DataFrame = {
    import spark.implicits._
    words.select(col("word")).as[String].mapPartitions { it =>
      val tg = tagger.value
      it.grouped(2048).flatMap { chunk => // batch size per t1.py:158
        // length-sorted per the MentionTagger seam contract (packed
        // inference); pairing is per-word so output order is irrelevant
        val sorted = chunk.sortBy(-_.length)
        sorted.zip(tg.tagBatch(sorted)).map { case (w, tags) => (w, tags.toSeq) }
      }
    }.toDF("word", "tags")
  }

  /** Embedding gather (`CC/loaders/utils/embedding.py:45-69`): vocab ×
    * embedding table left join; misses get a deterministic seeded uniform
    * ±sqrt(3/dim) vector (reference uses a global RNG — we key the RNG on
    * the word's hash, a documented deviation for partition-independence).
    */
  def embeddingGather(vocab: DataFrame, embeddings: DataFrame, dim: Int): DataFrame = {
    val bound = math.sqrt(3.0 / dim)
    val seeded = transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(col("word"), i), lit(1000000L)).cast("double") / 500000.0 - 1.0)
        * bound)
    val emb = embeddings.select(col("word").as("_emb_word"),
      col("embedding").as("_emb_vec"))
    // no broadcast hint: pretrained embedding tables are the UNBOUNDED side
    // (millions of words × dim floats — multi-GB at reference scale, past
    // any broadcast limit); AQE broadcasts small ones at runtime anyway
    vocab.join(emb, vocab("word") === emb("_emb_word"), "left")
      .select(vocab("word"),
        coalesce(col("_emb_vec"), seeded.cast("array<float>")).as("embedding"),
        col("_emb_vec").isNotNull.as("pretrained"))
  }

  /** Train/dev leakage check (`NER.ipynb` cells 0-2): texts present in both
    * splits. left_semi keeps it a single shuffle-free broadcast when dev is
    * small.
    */
  def overlap(train: DataFrame, dev: DataFrame, key: String = "text"): DataFrame =
    train.join(dev.select(col(key)), Seq(key), "left_semi")

  /** Sample-key dedup with "except" semantics (`expand_data.py:66-72`):
    * new items not already in `seen`.
    */
  def exceptSeen(newItems: DataFrame, seen: DataFrame, keys: Seq[String]): DataFrame =
    newItems.join(seen.select(keys.map(col): _*), keys, "left_anti")
}
