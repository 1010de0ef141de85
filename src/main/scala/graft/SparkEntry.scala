package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.stages.{Canon, Detect, Eval, Link, Pipeline, Triples}
import graft.synth.Transcripts

/** Driver contract — queries (Spark) + oracleSql (DuckDB) pairs.
  *
  * Column names are aligned 1:1 between each query and its oracle (the
  * driver sorts columns by name and hashes values). Floating-point
  * aggregates go through decimal casts or explicit `round(…, n)` with
  * HALF_UP semantics on exact doubles (verified identical in DuckDB 1.0).
  * Since round 3 EVERY query carries an oracle: the KG pipeline checks
  * against gold aux tables from the independent generator, the trained-IVF
  * quantizer against its dumped (bit-deterministic) centroid matrix, the
  * sketches against md5-derived hash60 re-derivations, and the IO tier
  * against DuckDB's own readers over committed fixture files.
  */
object SparkEntry {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** transcripts scale tied to the sf dir: ~6k/60k/600k turns (TESTDATA.md
    * tiers; mean conversation length ≈ 9.1 turns → 660k convs at sf=1).
    */
  def convsFor(dir: String): Long = {
    // LAST well-formed sf component in the path (a parent dir like
    // "sf2021_runs/sf0.01" must not win), and a number-shaped group — the
    // old [0-9.]+ matched "0.1." from "sf0.1.bak" and crashed toDouble
    val sf = raw"sf(\d+(?:\.\d+)?)".r.findAllMatchIn(dir).toSeq.lastOption
      .map(_.group(1).toDouble).getOrElse(0.01)
    math.max(20L, (660000 * sf).toLong)
  }

  /** Flagship query on sf=0.001: the full KG pipeline, counted per
    * conversation (driver smoke-checks rows>0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val r = Pipeline.run(spark, convsFor("sf0.001"))
    Triples.triplesPerConversation(r.triples.as[Triple](spark.implicits.newProductEncoder)).limit(20)
  }

  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational core (TPC-H-ish; oracle-checked) --------------------
    "q01_pricing_summary" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,6)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q02_revenue_by_nation" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      val n = tbl(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,6)")).cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("n_name"))
    }),
    "q03_top_orders_per_nation" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_nationkey"), col("rk"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double").as("o_totalprice"))
        .orderBy(col("c_nationkey"), col("rk"))
    }),
    "q04_customers_with_orders" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))
    }),
    "q05_customers_without_orders" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))
    }),
    "q06_union_dedup_orders" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 150000)
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
      a.unionByName(b).dropDuplicates("o_orderkey")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),
    "q07_sessionize_events" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
            (col("ts").cast("timestamp_ltz").cast("double") -
              col("prev_ts").cast("timestamp_ltz").cast("double")) > 1800d, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),
    "q08_event_rollup" -> ((s, dir) => {
      tbl(s, dir, "events")
        .rollup(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first)
    }),
    "q25_events_json" -> ((s, dir) => {
      tbl(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
        .orderBy(col("event_type"))
    }),

    // --- text analysis over documents (oracle-checked) ------------------
    "q09_gazetteer_mentions" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(text, '\\\\b(spark|customer|vector|window)\\\\b', 0)")).as("surface"))
        .groupBy(col("surface")).agg(count(lit(1)).as("n_mentions"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("surface"))
    }),
    "q10_doc_fingerprints" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),
    "q11_token_stats" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("lang"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
        .groupBy(col("lang"))
        .agg(sum(col("n_tok")).as("sum_tokens"),
          max(col("n_tok")).cast("long").as("max_tokens"), // int32 → int64 for oracle type parity
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),
    "q12_doc_profile" -> ((s, dir) => {
      tbl(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        round(TextAnalysis.meanTokenLen(col("text")), 4).as("mean_tok_len"),
        round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    }),
    "q13_langid" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // --- dedup family ----------------------------------------------------
    "q14_unigram_jaccard_pairs" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(tbl(s, dir, "documents"), k = 1,
        threshold = 0.8, maxShingleDf = 600)
        .orderBy(col("a"), col("b"))
    }),
    "q15_minhash_pairs" -> ((s, dir) => {
      // engine-portable MinHash+LSH at a SECOND operating point (bigram
      // shingles, 12 perms / 4 bands of 3) — q42 covers k=3/8-perm/2-row.
      // The spark.ml MinHashLSH variant this replaces stays test-pinned
      // (OpsSpec "minhash LSH candidates"); its hash family is not
      // SQL-expressible, so it could never earn an oracle row.
      Dedup.minhash60Pairs(tbl(s, dir, "documents"), k = Q15K,
        numPerms = Q15Perms, rowsPerBand = Q15Rows, threshold = Q15Threshold)
        .orderBy(col("a"), col("b"))
    }),
    "q16_simhash_sketch" -> ((s, dir) => {
      Dedup.simhash(tbl(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "q16b_simhash_pairs" -> ((s, dir) => {
      // hamming ≤ 8/60: the template-heavy fixture makes ≤16 quadratic in
      // the near-dup cluster sizes (2.2M pairs at sf0.1 — output-bound)
      Dedup.simhashPairs(tbl(s, dir, "documents"), maxHamming = Q16bMaxHamming)
    }),
    "q19_cosine_neardup" -> ((s, dir) => {
      // planes=8 (256 buckets) with radius-1 multi-probe: candidate space
      // ~n²/28 instead of the old planes=4 n²/16, recall strictly better
      Dedup.cosineNearDupPairs(tbl(s, dir, "embeddings"), threshold = 0.35,
        planes = 8, probeRadius = 1)
    }),

    // --- similarity search ------------------------------------------------
    "q17_cosine_topk" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    "q37_ann_ivf_topk" -> ((s, dir) => {
      // trained quantizer (2 Lloyd iterations). Oracle-checkable since
      // round 3: kmeansCentroids is bit-deterministic (decimal sums), so
      // the oracle reads the SAME matrix from the {AUX}/ivf_centroids dump
      // and re-derives assignment → probing → rerank in SQL (q40's shape).
      val emb = tbl(s, dir, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb, k = 3,
        nlist = 16, nprobe = 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    "q18_ann_lsh_topk" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      // ranks only: FP-robust for the cross-engine hash compare
      Similarity.lshTopK(emb.filter(col("vec_id") < 20), emb, k = 3, planes = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // --- multimodal plumbing ---------------------------------------------
    "q20_media_decode" -> ((s, dir) => {
      val media = Multimodal.synthMedia(tbl(s, dir, "documents"))
      Multimodal.decode(media).toDF().orderBy(col("media_id"))
    }),

    // --- KG pipeline over synthesized transcripts (rows-only checks) -----
    "q21_pipeline_mentions" -> ((s, dir) => {
      import s.implicits._
      val turns = Transcripts.turns(s, convsFor(dir))
      val tagger = Detect.lexiconTagger(s, Transcripts.aliasRows, Transcripts.tagSet)
      Detect.run(turns, tagger).groupBy(col("label"))
        .agg(count(lit(1)).as("n_mentions"),
          countDistinct(col("surface")).as("n_surfaces"))
        .orderBy(col("label"))
    }),
    "q22_pipeline_linked" -> ((s, dir) => {
      val r = Pipeline.run(s, convsFor(dir))
      r.linked.groupBy(col("method"), col("label"))
        .agg(count(lit(1)).as("n")).orderBy(col("method"), col("label"))
    }),
    "q23_pipeline_triples" -> ((s, dir) => {
      val r = Pipeline.run(s, convsFor(dir))
      r.triples.groupBy(col("pred")).agg(count(lit(1)).as("n_triples"))
        .orderBy(col("pred"))
    }),
    "q24_pipeline_conv_stats" -> ((s, dir) => {
      import s.implicits._
      val r = Pipeline.run(s, convsFor(dir))
      Triples.triplesPerConversation(r.triples.as[Triple])
        .agg(count(lit(1)).as("n_convs"), sum(col("n_triples")).as("n_triples"),
          max(col("n_triples")).as("max_per_conv"))
    }),
    // the hashed-key sorted exchange (UUID / opaque conv ids): conv ids are
    // remapped to UUID-shaped md5 text (injective at these scales, NOT
    // numeric-derivable), triples assembled via runEncodedSortedHashed. Both
    // aggregates are remap-invariant, so the gold triples oracle them: per-
    // pred triple counts AND per-pred distinct-conversation counts (the
    // latter fails if the hashed walker ever merged or split a conversation)
    "q48_triples_hashed_uuid" -> ((s, dir) => {
      import s.implicits._
      val r = Pipeline.run(s, convsFor(dir))
      val uuid = expr("concat(substr(md5(conv_id),1,8),'-',substr(md5(conv_id),9,4)," +
        "'-',substr(md5(conv_id),13,4),'-',substr(md5(conv_id),17,4),'-'," +
        "substr(md5(conv_id),21,12))")
      val canon = r.canon.withColumn("conv_id", uuid).as[CanonMention]
      Triples.runEncodedSortedHashed(canon, Pipeline.transcriptsDict)
        .groupBy(col("pred"))
        .agg(count(lit(1)).as("n_triples"),
          countDistinct(col("conv_id")).as("n_convs"))
        .orderBy(col("pred"))
    }),
    "q27_label_frequency" -> ((s, dir) => {
      // label frequency count over gazetteer hits (dis_calc.py:56-72 shape):
      // repeat vs non-repeat = count vs countDistinct
      tbl(s, dir, "documents")
        .select(explode(expr(
          "regexp_extract_all(text, '\\\\b(spark|customer|vector|window|table|stream)\\\\b', 0)"))
          .as("surface"))
        .withColumn("label",
          when(col("surface").isin("spark", "customer"), "ENT")
            .otherwise("TERM"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_total"), countDistinct(col("surface")).as("n_distinct"))
        .orderBy(col("label"))
    }),
    "q28_matched_words_sorted" -> ((s, dir) => {
      // corpus matched-word scan → global sorted distinct set
      // (lexicon_factory.py:37-58 semantics, gazetteer stand-in for trie)
      tbl(s, dir, "documents")
        .select(explode(expr(
          "regexp_extract_all(text, '\\\\b(spark|customer|vector|window|table|stream|batch)\\\\b', 0)"))
          .as("word"))
        .distinct().orderBy(col("word"))
    }),
    "q29_time_windows" -> ((s, dir) => {
      // tumbling event-time windows over events (streaming-shape agg, batch)
      tbl(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("timestamp_ltz").as("window_start"),
          col("event_type"), col("n"))
        .orderBy(col("window_start"), col("event_type"))
    }),
    "q30_topk_docs_per_lang" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      tbl(s, dir, "documents")
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
        .orderBy(col("lang"), col("rk"))
    }),
    "q31_overlap_check" -> ((s, dir) => {
      // train/dev leakage audit shape (first tokens shared between splits)
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), "\\s+").getItem(0).as("w"))
      val even = docs.filter(pmod(col("doc_id"), lit(2)) === 0).select("w").distinct()
      val odd = docs.filter(pmod(col("doc_id"), lit(2)) === 1).select("w").distinct()
      graft.ops.Augment.overlap(even, odd, "w").orderBy(col("w"))
    }),
    "q32_except_seen" -> ((s, dir) => {
      // first-bigram key: single first tokens fully overlap between splits
      // at every sf (tiny vocabulary), which would make the check vacuous
      val docs = tbl(s, dir, "documents")
        .select(col("doc_id"), concat_ws(" ",
          split(trim(col("text")), "\\s+").getItem(0),
          split(trim(col("text")), "\\s+").getItem(1)).as("w"))
      val even = docs.filter(pmod(col("doc_id"), lit(2)) === 0).select("w").distinct()
      val odd = docs.filter(pmod(col("doc_id"), lit(2)) === 1).select("w").distinct()
      graft.ops.Augment.exceptSeen(even, odd, Seq("w")).orderBy(col("w"))
    }),
    "q33_embedding_gather" -> ((s, dir) => {
      // vocab × embedding-table gather with deterministic seeded fallback
      // (embedding.py:45-69); oracle checks the hit/miss partitioning
      val emb = tbl(s, dir, "embeddings")
        .filter(col("vec_id") < 30)
        .select(concat(lit("w"), col("vec_id")).as("word"), col("embedding"))
      val vocab = tbl(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(concat(lit("w"), col("vec_id")).as("word"))
      graft.ops.Augment.embeddingGather(vocab, emb, dim = 64)
        .select(col("word"), col("pretrained")).orderBy(col("word"))
    }),
    "q34_augment_expansion" -> ((s, dir) => {
      val turns = Transcripts.turns(s, math.max(20L, convsFor(dir) / 10))
      val tagger = Detect.lexiconTagger(s, Transcripts.aliasRows, Transcripts.tagSet)
      // round 7: fused expansion — mention lists come straight from the
      // tagger, dropping the mention shuffle/join/checkpoint; output is
      // IDENTICAL to expandByReplacement over Detect.run (equivalence-
      // tested in AugmentSpec; the full splitmix64 SQL oracle is unchanged)
      graft.ops.Augment.expandDetected(turns, tagger, copies = Q34Copies)
        .groupBy(col("attempt")).agg(count(lit(1)).as("n_expanded"))
        .orderBy(col("attempt"))
    }),
    "q35_self_label_vocab" -> ((s, dir) => {
      val tagger = Detect.lexiconTagger(s, Transcripts.aliasRows, Transcripts.tagSet)
      // doc_id < 200 (not limit(200)): deterministic input → oracle-able
      val words = tbl(s, dir, "documents").filter(col("doc_id") < 200)
        .select(split(trim(col("text")), "\\s+").getItem(0).as("word")).distinct()
        .unionByName(s.createDataFrame(
          Transcripts.aliasRows.map(r => Tuple1(r.surface))).toDF("word"))
      graft.ops.Augment.selfLabelVocab(s, words, tagger)
        .withColumn("head_tag", col("tags").getItem(0))
        .groupBy(col("head_tag")).agg(count(lit(1)).as("n"))
        .orderBy(col("head_tag"))
    }),
    "q36_per_type_report" -> ((s, dir) => {
      val n = math.max(20L, convsFor(dir) / 10)
      val r = Pipeline.run(s, n)
      val gold = Transcripts.goldMentions(s, n).toDF()
      Eval.perTypeReport(r.mentions, gold).orderBy(col("label").asc_nulls_first)
    }),
    "q26_canon_components" -> ((s, dir) => {
      Canon.connectedComponents(
        s.createDataFrame(Transcripts.sameAs).toDF("src", "dst"))
        .orderBy(col("id"))
    }),
    "q38_multilabel_join" -> ((s, dir) => {
      // word→multi-label join (mlabel_le_loader.py:199-213): gazetteer words
      // × a multi-label dictionary, up to K=2 labels per word; CSV-encoded
      // labels keep the output hashable across engines
      val words = tbl(s, dir, "documents")
        .select(explode(expr(
          "regexp_extract_all(text, '\\\\b(spark|customer|vector|window|table|stream|batch)\\\\b', 0)"))
          .as("word"))
        .distinct()
      val dict = s.createDataFrame(multiLabelDict).toDF("word", "label")
      graft.stages.Link.multiLabelJoin(words, dict, k = 2)
        .select(col("word"), concat_ws(",", col("labels")).as("labels_csv"))
        .orderBy(col("word"))
    }),
    "q39_rolling_fingerprint" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.rollingMinHash(col("text")).as("rfp"))
        .orderBy(col("doc_id"))
    }),
    "q42_minhash_native_pairs" -> ((s, dir) => {
      // from-scratch MinHash+LSH on hash60 (engine-portable, full oracle;
      // q15 runs the same machinery at a second operating point — the old
      // spark.ml variant stays test-pinned only, see q15's note)
      Dedup.minhash60Pairs(tbl(s, dir, "documents"), k = 3, numPerms = 8,
        rowsPerBand = 2, threshold = 0.4)
        .orderBy(col("a"), col("b"))
    }),
    "q41_entity_prompts" -> ((s, dir) => {
      // per-entity cloze prompts (tag_convert.py:23-61 over the detect
      // output, per-turn origin dedup per lex_loader.py:156-171)
      val turns = Transcripts.turns(s, math.max(20L, convsFor(dir) / 10))
      val tagger = Detect.lexiconTagger(s, Transcripts.aliasRows, Transcripts.tagSet)
      val mentions = Detect.run(turns, tagger).toDF()
      graft.ops.Prompt.entityPrompts(mentions, PromptRules)
        .groupBy(col("prompt_origin"), col("prompt"), col("mask_csv"), col("tags_csv"))
        .agg(count(lit(1)).as("n_turns"))
        .orderBy(col("prompt_origin"))
    }),
    // --- IO tier over committed fixtures (fixtures/ in the repo) ----------
    "q43_jsonl_sentences" -> ((s, dir) => {
      // lenient JSONL sentence read: the invalid row (len(text)!=len(label))
      // lands in the _valid=false group instead of failing the job
      graft.io.Formats.readSentencesJsonl(s, s"$FixturesDir/sentences.jsonl", strict = false)
        .groupBy(col("_valid").as("valid"))
        .agg(count(lit(1)).as("n_rows"),
          sum(size(col("text"))).as("sum_chars"),
          sum(size(col("label"))).as("sum_label_chars"))
        .orderBy(col("valid"))
    }),
    "q44_conll_sentences" -> ((s, dir) => {
      graft.io.Formats.readConll(s, s"$FixturesDir/sample.conll")
        .groupBy(col("sentence_id"))
        .agg(count(lit(1)).as("n_tokens"),
          concat_ws(" ", transform(
            sort_array(collect_list(struct(col("line_no"), col("word")))),
            x => x.getField("word"))).as("words"),
          concat_ws(",", transform(
            sort_array(collect_list(struct(col("line_no"), col("tag")))),
            // null tag (separator-less line) → empty slot: concat_ws SKIPS
            // nulls, which would silently shorten tags_csv and misalign it
            // against n_tokens and the oracle's split_part '' slots
            x => coalesce(x.getField("tag"), lit("")))).as("tags_csv"))
        .orderBy(col("sentence_id"))
    }),
    "q45_merge_labels" -> ((s, dir) => {
      // label-file merge preserving first-seen order (merge_json.py:17-33)
      val merged = graft.io.Formats.mergeLabelLists(Seq(
        graft.io.Formats.readTagList(s"$FixturesDir/labels_a.txt"),
        graft.io.Formats.readTagList(s"$FixturesDir/labels_b.txt")))
      s.createDataFrame(merged.zipWithIndex.map { case (l, i) => (i, l) })
        .toDF("ord", "label").orderBy(col("ord"))
    }),
    "q46_span_chartags" -> ((s, dir) => {
      val df = s.read
        .schema("doc_id LONG, text STRING, spans ARRAY<STRUCT<start: INT, `end`: INT, label: STRING>>")
        .json(s"$FixturesDir/spans.jsonl")
      graft.io.Formats.spansToCharTags(df).orderBy(col("doc_id"), col("pos"))
    }),
    "q47_embedding_txt" -> ((s, dir) => {
      // header-driven dim, space-containing words kept, short/corrupt lines
      // dropped; vec_sum is exact (fixture values are small dyadic rationals)
      graft.io.Formats.readEmbeddingTxt(s, s"$FixturesDir/embeddings.txt")
        .select(col("word"),
          round(aggregate(col("embedding"), lit(0.0d),
            (a, x) => a + x.cast("double")), 6).as("vec_sum"))
        .orderBy(col("word"))
    }),

    "q40_ann_ivf_untrained" -> ((s, dir) => {
      // IVF with the raw seeded quantizer (kmeansIters = 0): the init hash
      // is md5-derived, so centroid election + cell assignment + probing +
      // rerank are all re-derivable in DuckDB from scratch. q37 (trained
      // quantizer) is also exactly oracled since round 3 — its oracle reads
      // the bit-deterministic trained matrix from {AUX}/ivf_centroids
      // instead of re-deriving the init
      val emb = tbl(s, dir, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb, k = 3,
        nlist = 16, nprobe = 3, kmeansIters = 0)
        .orderBy(col("query_id"), col("rank"))
    })
  )

  /** Committed IO-tier fixture files (q43–q47 + their DuckDB oracles read
    * the SAME files). Resolved absolute at class init — sbt/driver runs
    * from the repo root.
    */
  val FixturesDir: String = new java.io.File("fixtures").getAbsolutePath

  /** q16b hamming cutoff (shared between the Spark query and its oracle). */
  val Q16bMaxHamming = 8

  /** q15 native-minhash operating point (shared with its oracle). */
  val Q15K = 2; val Q15Perms = 12; val Q15Rows = 3; val Q15Threshold = 0.35

  /** q34 expansion copies (shared between the Spark query and its oracle). */
  val Q34Copies = 2

  /** q41 prompt rules: label type → cloze answer text (shared w/ oracle). */
  val PromptRules: Map[String, String] =
    Map("PER" -> "人物", "ORG" -> "机构", "LOC" -> "地点")

  /** Static multi-label dictionary for q38 (shared with its oracle). */
  val multiLabelDict: Seq[(String, String)] = Seq(
    "spark" -> "TECH", "spark" -> "ENGINE", "customer" -> "ROLE",
    "vector" -> "MATH", "vector" -> "TECH", "window" -> "UI",
    "window" -> "SQL", "window" -> "TIME", "table" -> "SQL",
    "stream" -> "TECH")

  // ---------------------------------------------------------------------
  private val discPrice =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))"

  /** Oracles marked `{AUX}` read the gold side-tables `graft.Verify` dumps
    * next to the query outputs (synthesized transcripts / gold mentions /
    * gold triples); Verify substitutes the placeholder with the absolute
    * aux path at dump time. These oracles are genuine cross-checks: the
    * gold tables come from the independent generator
    * (synth/Transcripts.scala), not from the pipeline under test.
    */
  val AuxToken = "{AUX}"

  /** DuckDB rendering of `TextAnalysis.hash60` (first 15 hex chars of md5
    * parsed as a 60-bit integer): md5 agrees across engines, so sketches
    * built on it hash-compare exactly. power(16, k) is a power of two —
    * exact in double — so the CAST chain is lossless.
    */
  private def duckHash60(x: String): String =
    "CAST(list_sum(list_transform(range(1,16), j -> " +
      s"CAST(strpos('0123456789abcdef', substring(md5($x), j, 1)) - 1 AS BIGINT) * " +
      "CAST(power(16, 15-j) AS BIGINT))) AS BIGINT)"

  /** DuckDB token list matching TextAnalysis.tokens(lower(text)). */
  private val duckToks =
    """list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)"""

  /** 60 per-bit sign terms of the SimHash sketch over a token-hash list
    * column `hs` (matches ops/Dedup.simhash bit for bit).
    */
  private val duckSimhashTerms: String = (0 until graft.ops.Dedup.SimhashBits).map { i =>
    s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
  }.mkString(" + ")

  private val duckSimhashCtes =
    // text IS NOT NULL mirrors Dedup.simhash's null-row drop — without it a
    // NULL-text doc null-propagates through the token list and surfaces as a
    // spurious simhash=0 row the Spark side never emits
    s"""WITH toksrc AS (SELECT doc_id, list_distinct($duckToks) AS ts
           FROM documents WHERE text IS NOT NULL),
       hsv AS (SELECT doc_id, list_transform(ts, t -> ${duckHash60("t")}) AS hs FROM toksrc),
       sig AS (SELECT doc_id, CAST($duckSimhashTerms AS BIGINT) AS simhash FROM hsv)"""

  private val duckSameAsValues: String =
    graft.synth.Transcripts.sameAs
      .map { case (a, b) => s"('$a','$b')" }.mkString(", ")

  /** DuckDB sign-LSH bucket over the SAME splitmix64 hyperplanes the Spark
    * side uses (ops/Similarity.hyperplanes) — the plane values are embedded
    * as double literals (Double.toString round-trips exactly), and both
    * engines dot float-widened-to-double against them.
    */
  private def duckSignBucket(vexpr: String, planes: Int, dim: Int = 64): String =
    graft.ops.Similarity.hyperplanes(planes, dim).zipWithIndex.map { case (pl, i) =>
      s"(CASE WHEN list_dot_product(CAST($vexpr AS DOUBLE[]), ${pl.mkString("[", ", ", "]")}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ---- splitmix64 + Java String.hashCode replicated in DuckDB SQL -------
  // (q34's seeded replacement draws: every pick is
  //  mix(convId.hashCode ^ turn<<20 ^ attempt<<40 ^ k) — ops/Augment.scala.)
  // 64-bit wrapping arithmetic via HUGEINT with 32-bit split multiplies;
  // each intermediate is a NAMED CTE column (naive nesting explodes the
  // expression exponentially). Verified value-exact against the JVM on
  // boundary + random inputs before wiring in.
  private val DuckH64 = "CAST(18446744073709551616 AS HUGEINT)"
  private val DuckB32 = "CAST(4294967296 AS HUGEINT)"
  private def duckU(x: String) =
    s"(CAST($x AS HUGEINT) + CASE WHEN ($x) < 0 THEN $DuckH64 ELSE CAST(0 AS HUGEINT) END)"
  private def duckWrap64(h: String) =
    s"(CASE WHEN (($h) % $DuckH64) >= CAST(9223372036854775808 AS HUGEINT) THEN ((($h) % $DuckH64) - $DuckH64) ELSE (($h) % $DuckH64) END)::BIGINT"
  private def duckLshr(x: String, n: Int) = s"CAST(${duckU(x)} >> $n AS BIGINT)"
  private def duckMulStages(prefix: String, x: String, c: BigInt): Seq[(String, String)] = {
    val cl = c & 0xFFFFFFFFL; val ch = c >> 32
    Seq(
      (s"${prefix}ux", duckU(x)),
      (s"${prefix}prod",
        s"((${prefix}ux % $DuckB32) * CAST($cl AS HUGEINT) + (((${prefix}ux >> 32) * CAST($cl AS HUGEINT) + (${prefix}ux % $DuckB32) * CAST($ch AS HUGEINT)) % $DuckB32) * $DuckB32)"),
      (s"${prefix}out", duckWrap64(s"${prefix}prod")))
  }
  /** splitmix64(zcol) → column `out`, as chained (col, expr) stages. */
  private def duckMixStages(zcol: String, out: String): Seq[(String, String)] =
    Seq(
      ("m_a", duckWrap64(s"(${duckU(zcol)} + CAST(${BigInt("9e3779b97f4a7c15", 16)} AS HUGEINT))")),
      ("m_b", s"xor(m_a, ${duckLshr("m_a", 30)})")) ++
    duckMulStages("m1_", "m_b", BigInt("bf58476d1ce4e5b9", 16)) ++
    Seq(("m_c", s"xor(m1_out, ${duckLshr("m1_out", 27)})")) ++
    duckMulStages("m2_", "m_c", BigInt("94d049bb133111eb", 16)) ++
    Seq((out, s"xor(m2_out, ${duckLshr("m2_out", 31)})"))
  private def duckWrap32(x: String) =
    s"((((($x) + 2147483648) % 4294967296 + 4294967296) % 4294967296) - 2147483648)"
  /** Java String.hashCode over a fixed-length column (conv ids are exactly
    * "conv_%08d" = 13 chars for every corpus size this query runs at).
    */
  private def duckJavaHash(col: String, len: Int): String = {
    var e = "CAST(0 AS BIGINT)"
    for (i <- 1 to len) e = duckWrap32(s"31*($e) + ascii(substring($col, $i, 1))")
    s"CAST($e AS BIGINT)"
  }
  /** Full q34 oracle: replay expandByReplacement's seeded draws in SQL —
    * pools from the gold mention aux, per-mention k by the sort_array
    * order, pick = pool[(mix(seed) >>> 1) % |pool|], count turns changed.
    */
  private def q34Oracle: String = {
    val mixStages = duckMixStages("z", "mixed")
    val ctes = Seq(
      s"""m AS (SELECT conv_id, turn_idx, start, "end", label, surface FROM read_parquet('{AUX}/gold_mentions_small/*.parquet'))""",
      """pools AS (SELECT label, len(surface) AS ln, list(surface ORDER BY surface) AS pool FROM (SELECT DISTINCT label, surface FROM m) GROUP BY label, len(surface))""",
      """km AS (SELECT conv_id, turn_idx, label, surface, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY start, "end", label, surface) - 1 AS k FROM m)""",
      s"""c0 AS (SELECT km.conv_id, km.turn_idx, km.surface, att.attempt, pools.pool,
         xor(xor(xor(${duckJavaHash("km.conv_id", 13)}, CAST(km.turn_idx AS BIGINT) << 20), CAST(att.attempt AS BIGINT) << 40), CAST(km.k AS BIGINT)) AS z
         FROM km CROSS JOIN (SELECT UNNEST([${(1 to Q34Copies).mkString(",")}]) AS attempt) att
         JOIN pools ON pools.label = km.label AND pools.ln = len(km.surface))""") ++
      mixStages.zipWithIndex.map { case ((col, expr), i) =>
        s"c${i + 1} AS (SELECT *, $expr AS $col FROM c$i)"
      } ++ Seq(
      s"""picks AS (SELECT conv_id, turn_idx, attempt, surface,
         pool[CAST((${duckLshr("mixed", 1)}) % len(pool) AS INT) + 1] AS pick FROM c${mixStages.length})""",
      """turns AS (SELECT conv_id, turn_idx, attempt, bool_or(pick <> surface) AS changed FROM picks GROUP BY 1, 2, 3)""")
    "WITH " + ctes.mkString(",\n") +
      "\nSELECT attempt, COUNT(*) AS n_expanded FROM turns WHERE changed GROUP BY attempt ORDER BY attempt"
  }

  /** Full SQL re-derivation of `Dedup.minhash60Pairs` at any operating
    * point: distinct k-shingles → numPerms keyed-hash60 min-signatures →
    * bands of rowsPerBand → candidate pairs on band equality → exact
    * Jaccard ≥ threshold. Used by q42 and q15 (two operating points).
    */
  private def minhash60OracleSql(k: Int, numPerms: Int, rowsPerBand: Int,
                                 threshold: Double): String = {
    val nBands = numPerms / rowsPerBand
    val bandList = (0 until nBands).mkString(",")
    s"""WITH sh AS (SELECT doc_id, list_distinct(list_transform(range(0, greatest(len(ts) - $k, 0) + 1),
           i -> array_to_string(list_slice(ts, i + 1, i + $k), ' '))) AS ss
         FROM (SELECT doc_id, $duckToks AS ts FROM documents) WHERE len(ts) > 0),
       sig AS (SELECT doc_id, ss, list_transform(range(0, $numPerms), i ->
           list_min(list_transform(ss, s -> ${duckHash60("i::VARCHAR || ':' || s")}))) AS sig FROM sh),
       banded AS (SELECT doc_id, ss, b, sig[b*$rowsPerBand+1 : b*$rowsPerBand+$rowsPerBand] AS key FROM sig
         CROSS JOIN (SELECT UNNEST([$bandList]) AS b) bands),
       cand AS (SELECT DISTINCT x.doc_id AS pa, y.doc_id AS pb, x.ss AS sa, y.ss AS sb
         FROM banded x JOIN banded y ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id)
       SELECT pa AS a, pb AS b, jaccard FROM (
         SELECT pa, pb, ROUND(len(list_intersect(sa, sb)) /
           (len(sa) + len(sb) - len(list_intersect(sa, sb))), 6) AS jaccard FROM cand)
       WHERE jaccard >= $threshold ORDER BY a, b"""
  }

  /** Spark-exact cosine (vec_dot formula incl. the symmetric 1e-12 guard —
    * both norms, matching `Similarity.cosine`: zero vectors score 0, not
    * NaN, on either side).
    */
  private def duckCosine(a: String, b: String): String =
    s"(list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) / " +
      s"(greatest(sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))), 1e-12) * " +
      s"greatest(sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))), 1e-12)))"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-09-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_revenue_by_nation" ->
      s"""SELECT n_name,
         CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         COUNT(DISTINCT o_orderkey) AS n_orders
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q03_top_orders_per_nation" ->
      """SELECT c_nationkey, rk, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice FROM (
           SELECT c_nationkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rk <= 3 ORDER BY c_nationkey, rk""",
    "q04_customers_with_orders" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q05_customers_without_orders" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q06_union_dedup_orders" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM (
           SELECT DISTINCT ON (o_orderkey) * FROM (
             SELECT * FROM orders WHERE o_totalprice > 150000
             UNION ALL
             SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'))
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q07_sessionize_events" ->
      """SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
           SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM (
             SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                    OR (EPOCH(ts) - EPOCH(prev_ts)) > 1800 THEN 1 ELSE 0 END AS new_s
             FROM (SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
               FROM events)))
         GROUP BY user_id ORDER BY user_id""",
    "q08_event_rollup" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY ROLLUP(event_type)
         ORDER BY event_type NULLS FIRST""",
    "q25_events_json" ->
      """SELECT event_type,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q09_gazetteer_mentions" ->
      """SELECT surface, COUNT(*) AS n_mentions, COUNT(DISTINCT doc_id) AS n_docs
         FROM (SELECT doc_id,
           UNNEST(regexp_extract_all(text, '\b(spark|customer|vector|window)\b')) AS surface
           FROM documents)
         GROUP BY surface ORDER BY surface""",
    "q10_doc_fingerprints" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
         FROM documents ORDER BY doc_id""",
    "q11_token_stats" ->
      """SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens, CAST(MAX(n_tok) AS BIGINT) AS max_tokens,
         COUNT(*) AS n_docs FROM (
           SELECT lang, len(list_filter(regexp_split_to_array(trim(text), '\s+'),
             t -> len(t) > 0)) AS n_tok FROM documents)
         GROUP BY lang ORDER BY lang""",
    "q12_doc_profile" ->
      """SELECT doc_id, n_tokens,
         ROUND(CAST(sum_len AS DOUBLE) / GREATEST(n_tokens, 1), 4) AS mean_tok_len,
         ROUND(CAST(n_stop AS DOUBLE) / GREATEST(n_tokens, 1), 4) AS stopword_ratio
         FROM (
           SELECT doc_id,
             len(toks) AS n_tokens,
             list_sum(list_transform(toks, t -> len(t))) AS sum_len,
             len(list_filter(list_transform(toks, t -> lower(t)),
               t -> t IN ('the','a','of','and','is'))) AS n_stop
           FROM (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0) AS toks
             FROM documents))
         ORDER BY doc_id""",
    "q13_langid" ->
      """SELECT doc_id,
         CASE WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
              WHEN best > 0 AND h_de = best THEN 'de'
              WHEN best > 0 AND h_en = best THEN 'en'
              WHEN best > 0 AND h_es = best THEN 'es'
              WHEN best > 0 AND h_fr = best THEN 'fr'
              ELSE 'und' END AS lang_pred
         FROM (SELECT doc_id, text, h_en, h_de, h_es, h_fr,
             GREATEST(h_en, h_de, h_es, h_fr) AS best
           FROM (SELECT doc_id, text,
             len(list_filter(toks, t -> t IN ('the','a','of','and','is'))) AS h_en,
             len(list_filter(toks, t -> t IN ('der','die','und','ist','ein'))) AS h_de,
             len(list_filter(toks, t -> t IN ('el','la','de','y','es'))) AS h_es,
             len(list_filter(toks, t -> t IN ('le','la','et','est','un'))) AS h_fr
             FROM (SELECT doc_id, text,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                 t -> len(t) > 0) AS toks FROM documents)))
         ORDER BY doc_id""",
    "q14_unigram_jaccard_pairs" ->
      """WITH sh AS (
           SELECT doc_id, len(shingles) AS n_sh, UNNEST(shingles) AS shingle FROM (
             SELECT doc_id, list_distinct(list_filter(
               regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)) AS shingles
             FROM documents)),
         rare AS (
           SELECT shingle FROM sh GROUP BY shingle
           HAVING COUNT(*) <= 600 AND COUNT(*) >= 2),
         shf AS (SELECT sh.* FROM sh JOIN rare USING (shingle))
         SELECT a, b, jaccard FROM (
           SELECT x.doc_id AS a, y.doc_id AS b, x.n_sh AS na, y.n_sh AS nb,
             COUNT(*) AS inter,
             ROUND(CAST(COUNT(*) AS DOUBLE) / (x.n_sh + y.n_sh - COUNT(*)), 6) AS jaccard
           FROM shf x JOIN shf y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           GROUP BY x.doc_id, y.doc_id, x.n_sh, y.n_sh)
         WHERE jaccard >= 0.8 ORDER BY a, b""",
    "q27_label_frequency" ->
      """SELECT CASE WHEN surface IN ('spark','customer') THEN 'ENT' ELSE 'TERM' END AS label,
         COUNT(*) AS n_total, COUNT(DISTINCT surface) AS n_distinct
         FROM (SELECT UNNEST(regexp_extract_all(text,
           '\b(spark|customer|vector|window|table|stream)\b')) AS surface FROM documents)
         GROUP BY 1 ORDER BY 1""",
    "q28_matched_words_sorted" ->
      """SELECT DISTINCT UNNEST(regexp_extract_all(text,
           '\b(spark|customer|vector|window|table|stream|batch)\b')) AS word
         FROM documents ORDER BY word""",
    "q29_time_windows" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q30_topk_docs_per_lang" ->
      """SELECT lang, rk, doc_id, n_chars FROM (
           SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY n_chars DESC, doc_id ASC) AS rk FROM documents)
         WHERE rk <= 3 ORDER BY lang, rk""",
    "q31_overlap_check" ->
      """SELECT w FROM (
           SELECT DISTINCT split_part(trim(text), ' ', 1) AS w FROM documents WHERE doc_id % 2 = 0
           INTERSECT
           SELECT DISTINCT split_part(trim(text), ' ', 1) AS w FROM documents WHERE doc_id % 2 = 1)
         ORDER BY w""",
    "q32_except_seen" ->
      """SELECT w FROM (
           SELECT DISTINCT split_part(trim(text), ' ', 1) || ' ' || split_part(trim(text), ' ', 2) AS w
           FROM documents WHERE doc_id % 2 = 0
           EXCEPT
           SELECT DISTINCT split_part(trim(text), ' ', 1) || ' ' || split_part(trim(text), ' ', 2) AS w
           FROM documents WHERE doc_id % 2 = 1)
         ORDER BY w""",
    "q33_embedding_gather" ->
      """SELECT 'w' || v.vec_id AS word, e.vec_id IS NOT NULL AS pretrained
         FROM embeddings v LEFT JOIN (SELECT vec_id FROM embeddings WHERE vec_id < 30) e
           ON v.vec_id = e.vec_id
         WHERE v.vec_id < 60 ORDER BY word""",
    "q17_cosine_topk" ->
      s"""SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY ${duckCosine("q.embedding", "c.embedding")} DESC,
                        c.vec_id ASC) AS rank
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 5)
         WHERE rank <= 3 ORDER BY query_id, rank""",

    // --- sign-LSH family (literal-hyperplane buckets, engine-exact) ------
    "q18_ann_lsh_topk" ->
      s"""WITH cb AS (SELECT vec_id, embedding,
             ${duckSignBucket("embedding", 4)} AS bucket FROM embeddings)
         SELECT query_id, neighbor_id, rank FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY ${duckCosine("q.embedding", "c.embedding")} DESC,
                        c.vec_id ASC) AS rank
           FROM cb q JOIN cb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
           WHERE q.vec_id < 20)
         WHERE rank <= 3 ORDER BY query_id, rank""",
    "q19_cosine_neardup" ->
      s"""WITH cb AS (SELECT vec_id, embedding,
             ${duckSignBucket("embedding", 8)} AS bucket FROM embeddings)
         SELECT a, b, ROUND(rawcos, 6) AS cos FROM (
           SELECT x.vec_id AS a, y.vec_id AS b,
             ${duckCosine("x.embedding", "y.embedding")} AS rawcos
           FROM cb x JOIN cb y
             ON x.vec_id < y.vec_id AND bit_count(xor(x.bucket, y.bucket)) <= 1)
         WHERE rawcos >= 0.35 ORDER BY a, b""",

    "q20_media_decode" ->
      s"""SELECT doc_id AS media_id,
         (['image','audio','video'])[CAST(${duckHash60("CAST(doc_id AS VARCHAR) || ':k'")} % 3 AS INT) + 1] AS kind,
         CAST(${duckHash60("CAST(doc_id AS VARCHAR) || ':w'")} % 4096 AS INT) AS width,
         CAST(${duckHash60("CAST(doc_id AS VARCHAR) || ':h'")} % 4096 AS INT) AS height,
         CAST(octet_length(encode(text)) * 10 AS INT) AS duration_ms,
         CAST(octet_length(encode(text)) + 20 AS INT) AS n_bytes
         FROM documents ORDER BY media_id""",
    "q40_ann_ivf_untrained" ->
      s"""WITH seedh AS (SELECT vec_id, embedding,
             ${duckHash60("CAST(vec_id AS VARCHAR) || ':7'")} AS h FROM embeddings),
         cents AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, embedding AS cv
           FROM (SELECT * FROM seedh ORDER BY h, vec_id LIMIT 16)),
         scored AS (SELECT e.vec_id, e.embedding, c.cid,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(c.cv AS DOUBLE[])) AS dot
           FROM embeddings e CROSS JOIN cents c),
         assigned AS (SELECT vec_id, embedding, cid AS cell FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) AS rn
             FROM scored) WHERE rn = 1),
         qprobes AS (SELECT vec_id AS query_id, embedding AS qv, cid AS cell FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid DESC) AS rn
             FROM scored WHERE vec_id < 20) WHERE rn <= 3),
         cand AS (SELECT q.query_id, a.vec_id AS neighbor_id,
             ${duckCosine("q.qv", "a.embedding")} AS rawcos
           FROM qprobes q JOIN assigned a ON a.cell = q.cell AND a.vec_id <> q.query_id)
         SELECT query_id, neighbor_id, rank, ROUND(rawcos, 6) AS cos FROM (
           SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY rawcos DESC, neighbor_id ASC) AS INT) AS rank FROM cand)
         WHERE rank <= 3 ORDER BY query_id, rank""",

    "q37_ann_ivf_topk" ->
      s"""WITH cents AS (SELECT cid, cv
             FROM read_parquet('{AUX}/ivf_centroids/*.parquet')),
         scored AS (SELECT e.vec_id, e.embedding, c.cid,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv) AS dot
           FROM embeddings e CROSS JOIN cents c),
         assigned AS (SELECT vec_id, embedding, cid AS cell FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid ASC) AS rn
             FROM scored) WHERE rn = 1),
         qprobes AS (SELECT vec_id AS query_id, embedding AS qv, cid AS cell FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid DESC) AS rn
             FROM scored WHERE vec_id < 20) WHERE rn <= 3),
         cand AS (SELECT q.query_id, a.vec_id AS neighbor_id,
             ${duckCosine("q.qv", "a.embedding")} AS rawcos
           FROM qprobes q JOIN assigned a ON a.cell = q.cell AND a.vec_id <> q.query_id)
         SELECT query_id, neighbor_id, rank, ROUND(rawcos, 6) AS cos FROM (
           SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY rawcos DESC, neighbor_id ASC) AS INT) AS rank FROM cand)
         WHERE rank <= 3 ORDER BY query_id, rank""",

    // --- md5-based sketches (cross-engine since hash60 is md5-derived) ---
    "q16_simhash_sketch" ->
      s"""$duckSimhashCtes
         SELECT doc_id, simhash FROM sig ORDER BY doc_id""",
    "q16b_simhash_pairs" ->
      s"""$duckSimhashCtes,
         -- mirror simhashPairs' blank-doc exclusion (all blanks sketch to 0
         -- and would form one quadratic bucket; inert on this corpus)
         sigp AS (SELECT s.doc_id, s.simhash FROM sig s
           JOIN documents d USING (doc_id) WHERE trim(d.text) <> ''),
         banded AS (SELECT doc_id, simhash, b, (simhash >> (b * 15)) & 32767 AS key
           FROM sigp CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS b) bands),
         pairs AS (SELECT DISTINCT x.doc_id AS pa, y.doc_id AS pb,
             x.simhash AS sa, y.simhash AS sb
           FROM banded x JOIN banded y
             ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id)
         SELECT pa AS a, pb AS b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
         FROM pairs WHERE bit_count(xor(sa, sb)) <= $Q16bMaxHamming ORDER BY a, b""",
    "q42_minhash_native_pairs" -> minhash60OracleSql(
      k = 3, numPerms = 8, rowsPerBand = 2, threshold = 0.4),
    "q15_minhash_pairs" -> minhash60OracleSql(
      k = Q15K, numPerms = Q15Perms, rowsPerBand = Q15Rows, threshold = Q15Threshold),
    "q39_rolling_fingerprint" ->
      s"""SELECT doc_id, CAST(list_min(list_transform(grams, g -> ${duckHash60("g")})) AS BIGINT) AS rfp
         FROM (SELECT doc_id, list_transform(range(0, greatest(len(ts) - 4, 0) + 1),
             i -> array_to_string(list_slice(ts, i + 1, i + 4), ' ')) AS grams
           FROM (SELECT doc_id, $duckToks AS ts FROM documents))
         ORDER BY doc_id""",

    // --- IO tier over the committed fixtures (read with DuckDB's own
    //     readers: read_json / read_text — fully independent of Spark) -----
    "q43_jsonl_sentences" ->
      // read_text + per-line json parsing, NOT strict read_json: the reader's
      // lenient mode routes malformed JSON to the counted _valid=false group,
      // which a strict read_json oracle could only abort on. Validity mirrors
      // readSentencesJsonl: parseable AND text present/castable AND (label
      // absent OR castable with len(text)=len(label)); blank lines (Java
      // trim) are skipped like Spark's JSON source does.
      s"""WITH raw AS (SELECT string_split(content, chr(10)) AS ls
             FROM read_text('$FixturesDir/sentences.jsonl')),
         lines AS (SELECT UNNEST(ls) AS line FROM raw),
         -- json_extract THROWS on malformed JSON in DuckDB — every extract
         -- is gated behind json_valid
         rows_ AS (SELECT json_valid(line) AS jv,
             TRY_CAST(CASE WHEN json_valid(line)
               THEN json_extract(line, '$$.text') END AS VARCHAR[]) AS text,
             CASE WHEN json_valid(line)
               THEN json_extract(line, '$$.label') END AS label_j,
             TRY_CAST(CASE WHEN json_valid(line)
               THEN json_extract(line, '$$.label') END AS VARCHAR[]) AS label
           FROM lines WHERE NOT regexp_matches(line, '^[\\x00-\\x20]*$$')),
         checked AS (SELECT (jv AND text IS NOT NULL AND (label_j IS NULL OR
             (label IS NOT NULL AND len(text) = len(label)))) AS valid,
             text, label FROM rows_)
         SELECT valid, COUNT(*) AS n_rows,
           CAST(SUM(len(text)) AS BIGINT) AS sum_chars,
           CAST(SUM(len(label)) AS BIGINT) AS sum_label_chars
         FROM checked GROUP BY 1 ORDER BY 1""",
    "q44_conll_sentences" ->
      s"""WITH raw AS (SELECT string_split(content, chr(10)) AS ls
             FROM read_text('$FixturesDir/sample.conll')),
         lines AS (SELECT UNNEST(range(1, len(ls)+1)) AS line_no, UNNEST(ls) AS line FROM raw),
         -- blank = Java String.trim semantics (any run of chars <= U+0020),
         -- matching readConll's contract — DuckDB's trim() strips spaces only
         seg AS (SELECT line_no, line,
             CAST(SUM(CASE WHEN regexp_matches(line, '^[\\x00-\\x20]*$$') THEN 1 ELSE 0 END)
               OVER (ORDER BY line_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sentence_id
           FROM lines),
         toks AS (SELECT sentence_id, line_no, split_part(line,' ',1) AS word,
             split_part(line,' ',2) AS tag
           FROM seg WHERE NOT regexp_matches(line, '^[\\x00-\\x20]*$$'))
         SELECT sentence_id, COUNT(*) AS n_tokens,
           string_agg(word, ' ' ORDER BY line_no) AS words,
           string_agg(tag, ',' ORDER BY line_no) AS tags_csv
         FROM toks GROUP BY sentence_id ORDER BY sentence_id""",
    "q45_merge_labels" ->
      s"""WITH fa AS (SELECT string_split(content, chr(10)) AS ls
             FROM read_text('$FixturesDir/labels_a.txt')),
         fb AS (SELECT string_split(content, chr(10)) AS ls
             FROM read_text('$FixturesDir/labels_b.txt')),
         -- Java String.trim (strips all chars <= U+0020, matching
         -- readTagList), not DuckDB trim (spaces only)
         la AS (SELECT UNNEST(range(1, len(ls)+1)) AS pos,
             regexp_replace(UNNEST(ls), '^[\\x00-\\x20]+|[\\x00-\\x20]+$$', '', 'g') AS label FROM fa),
         lb AS (SELECT UNNEST(range(1, len(ls)+1)) + 1000000 AS pos,
             regexp_replace(UNNEST(ls), '^[\\x00-\\x20]+|[\\x00-\\x20]+$$', '', 'g') AS label FROM fb),
         allr AS (SELECT * FROM la UNION ALL SELECT * FROM lb),
         firsts AS (SELECT label, MIN(pos) AS fp FROM allr WHERE label <> '' GROUP BY label)
         SELECT CAST(row_number() OVER (ORDER BY fp) - 1 AS INT) AS ord, label
         FROM firsts ORDER BY ord""",
    "q46_span_chartags" ->
      s"""WITH d AS (SELECT * FROM read_json('$FixturesDir/spans.jsonl', format='newline_delimited',
             columns={doc_id: 'BIGINT', text: 'VARCHAR',
                      spans: 'STRUCT("start" INT, "end" INT, label VARCHAR)[]'})),
         chars AS (SELECT doc_id, spans,
             CAST(UNNEST(range(0, length(text))) AS INT) AS pos,
             UNNEST(list_transform(range(0, length(text)),
               i -> substring(text, CAST(i+1 AS INT), 1))) AS ch
           FROM d),
         tagged AS (SELECT doc_id, pos, ch,
             list_filter(spans, sp -> pos >= sp."start" AND pos < sp."end")[1] AS sp FROM chars)
         SELECT doc_id, pos, ch,
           CASE WHEN sp IS NULL THEN 'O'
                WHEN sp."end" - sp."start" = 1 THEN 'S-' || sp.label
                WHEN pos = sp."start" THEN 'B-' || sp.label
                WHEN pos = sp."end" - 1 THEN 'E-' || sp.label
                ELSE 'I-' || sp.label END AS tag
         FROM tagged ORDER BY doc_id, pos""",
    "q47_embedding_txt" ->
      s"""WITH raw AS (SELECT string_split(content, chr(10)) AS ls
             FROM read_text('$FixturesDir/embeddings.txt')),
         lines AS (SELECT UNNEST(ls) AS line FROM raw),
         nz AS (SELECT trim(line) AS line FROM lines
           WHERE trim(line) <> '' AND NOT regexp_matches(trim(line), '^\\d+\\s+\\d+$$')),
         parts AS (SELECT list_filter(string_split_regex(line, '\\s+'), t -> len(t) > 0) AS p FROM nz),
         ok AS (SELECT p FROM parts WHERE len(p) >= 5
           AND len(list_filter(p[len(p)-3:len(p)], x -> TRY_CAST(x AS REAL) IS NULL)) = 0)
         SELECT array_to_string(p[1:len(p)-4], ' ') AS word,
           ROUND(list_sum(list_transform(p[len(p)-3:len(p)],
             x -> CAST(CAST(x AS REAL) AS DOUBLE))), 6) AS vec_sum
         FROM ok ORDER BY word""",

    // --- gold-table cross-checks (aux tables dumped by graft.Verify from
    //     the independent generator; pipeline output must equal gold) ------
    "q21_pipeline_mentions" ->
      s"""SELECT label, COUNT(*) AS n_mentions, COUNT(DISTINCT surface) AS n_surfaces
         FROM read_parquet('{AUX}/gold_mentions/*.parquet')
         GROUP BY label ORDER BY label""",
    "q22_pipeline_linked" ->
      s"""SELECT 'exact' AS method, label, COUNT(*) AS n
         FROM read_parquet('{AUX}/gold_mentions/*.parquet')
         GROUP BY label ORDER BY 1, 2""",
    "q23_pipeline_triples" ->
      s"""SELECT pred, COUNT(*) AS n_triples
         FROM read_parquet('{AUX}/gold_triples/*.parquet')
         GROUP BY pred ORDER BY pred""",
    "q48_triples_hashed_uuid" ->
      s"""SELECT pred, COUNT(*) AS n_triples, COUNT(DISTINCT conv_id) AS n_convs
         FROM read_parquet('{AUX}/gold_triples/*.parquet')
         GROUP BY pred ORDER BY pred""",
    "q24_pipeline_conv_stats" ->
      s"""SELECT COUNT(*) AS n_convs, CAST(SUM(n) AS BIGINT) AS n_triples,
           CAST(MAX(n) AS BIGINT) AS max_per_conv
         FROM (SELECT conv_id, COUNT(*) AS n
           FROM read_parquet('{AUX}/gold_triples/*.parquet') GROUP BY conv_id)""",
    "q36_per_type_report" ->
      s"""SELECT label, n AS n_match, n AS n_pred, n AS n_gold,
           CAST(1.0 AS DOUBLE) AS "precision", CAST(1.0 AS DOUBLE) AS recall,
           CAST(1.0 AS DOUBLE) AS f1
         FROM (SELECT label, COUNT(*) AS n FROM (
             SELECT DISTINCT conv_id, turn_idx, start, "end", label
             FROM read_parquet('{AUX}/gold_mentions_small/*.parquet'))
           GROUP BY ROLLUP(label))
         ORDER BY label NULLS FIRST""",
    "q26_canon_components" ->
      s"""WITH RECURSIVE edges AS (SELECT * FROM (VALUES $duckSameAsValues) e(src, dst)),
         sym AS (SELECT src AS u, dst AS v FROM edges UNION SELECT dst, src FROM edges),
         reach(u, v) AS (
           SELECT u, v FROM sym
           UNION
           SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u)
         SELECT u AS id, LEAST(u, MIN(v)) AS canonical_id
         FROM reach GROUP BY u ORDER BY id""",
    "q34_augment_expansion" -> q34Oracle,
    "q41_entity_prompts" ->
      s"""WITH m AS (SELECT DISTINCT conv_id, turn_idx, label, surface
           FROM read_parquet('{AUX}/gold_mentions_small/*.parquet')
           WHERE length(surface) > 1),
         rules AS (SELECT * FROM (VALUES ${PromptRules.toSeq.sorted.map { case (l, r) => s"('$l','$r')" }.mkString(", ")}) r(label, rule)),
         p AS (SELECT conv_id, turn_idx,
             surface || '是一个' || rule || ',' AS prompt_origin,
             surface || '是一个' || repeat('[MASK]', length(rule)) || ',' AS prompt,
             repeat('1,', length(surface)) || '1,1,1,' || repeat('0,', length(rule)) || '1' AS mask_csv,
             'B-' || label || repeat(',I-' || label, length(surface) - 2) || ',E-' || label ||
               repeat(',O', 3 + length(rule) + 1) AS tags_csv
           FROM m JOIN rules USING (label))
         SELECT prompt_origin, prompt, mask_csv, tags_csv, COUNT(*) AS n_turns
         FROM p GROUP BY 1, 2, 3, 4 ORDER BY prompt_origin""",
    "q35_self_label_vocab" ->
      s"""WITH w1 AS (SELECT DISTINCT split_part(trim(text), ' ', 1) AS word
           FROM documents WHERE doc_id < 200),
         allw AS (SELECT word FROM w1
           UNION ALL SELECT * FROM (VALUES ${graft.synth.Transcripts.aliasRows.map(r => s"('${r.surface}')").mkString(", ")}) a(word)),
         dict AS (SELECT * FROM (VALUES ${graft.synth.Transcripts.aliasRows.map(r => s"('${r.surface}','${r.label}')").mkString(", ")}) d(surface, label))
         SELECT head_tag, COUNT(*) AS n FROM (
           SELECT CASE WHEN lbl IS NOT NULL THEN 'B-' || lbl ELSE 'O' END AS head_tag FROM (
             SELECT w.word,
               (SELECT MIN(d.label) FROM dict d WHERE starts_with(w.word, d.surface)) AS lbl
             FROM allw w))
         GROUP BY head_tag ORDER BY head_tag""",
    "q38_multilabel_join" ->
      s"""WITH words AS (SELECT DISTINCT UNNEST(regexp_extract_all(text,
             '\\b(spark|customer|vector|window|table|stream|batch)\\b')) AS word
           FROM documents),
         dict AS (SELECT * FROM (VALUES ${multiLabelDict.map { case (w, l) => s"('$w','$l')" }.mkString(", ")}) d(word, label))
         SELECT w.word, COALESCE(array_to_string(list_slice(
             list_sort(list(d.label) FILTER (WHERE d.label IS NOT NULL)), 1, 2), ','), '') AS labels_csv
         FROM words w LEFT JOIN dict d ON w.word = d.word
         GROUP BY w.word ORDER BY w.word"""
  )
}
