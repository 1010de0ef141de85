package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for 100TB-scale training-data curation.
  *
  * Scale notes baked into each physical plan:
  *  - exact dedup is a single hash-shuffle on the 16-byte fingerprint (never
  *    on the raw text);
  *  - n-gram Jaccard and MinHash both go through an *inverted index /
  *    bucket join* so the quadratic pair space never materializes — only
  *    same-bucket candidates shuffle;
  *  - SimHash reduces each doc to 64 bits, bands of 16 bits block the join;
  *  - all outputs are canonical pairs (a < b), distinct.
  */
object Dedup {

  /** Exact dedup: keep the smallest doc_id per normalized-content
    * fingerprint. Two shuffles max (agg + semi join); at scale the agg is
    * map-side-combined on the md5 key.
    */
  def exact(docs: DataFrame): DataFrame = {
    val fp = docs.withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val keep = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    fp.join(keep, Seq("fp", "doc_id"), "left_semi").drop("fp")
  }

  /** Exact-duplicate groups: fingerprint → n copies, kept id. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_copies") > 1)

  /** distinct token k-shingles per doc. Empty/whitespace-only docs get an
    * EMPTY array (the `array_remove` strips the "" gram the
    * greatest(…,1)-guarded sequence manufactures for zero tokens —
    * matching `kShingles`' semantics, and keeping every blank doc out of
    * `minhashLshPairs`' buckets, where a shared hash("") feature would
    * otherwise put ALL blank docs into one quadratic mega-bucket).
    */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col("text")))
    val idx = sequence(lit(1), greatest(size(toks) - (k - 1), lit(1)))
    docs.select(col("doc_id"),
      array_remove(
        array_distinct(transform(idx, i => concat_ws(" ", slice(toks, i, lit(k))))),
        "").as("shingles"))
  }

  /** Near-dup pairs by exact n-gram Jaccard ≥ `threshold`, via inverted
    * index: explode shingles → self-join on shingle → per-pair intersection
    * count → |A∪B| = |A|+|B|−|A∩B|. Shuffles on the shingle key (frequency-
    * bounded: a shingle shared by f docs contributes f² pair rows — at scale
    * drop shingles with document frequency above a cap, which cannot create
    * high-Jaccard pairs anyway at realistic doc sizes).
    *
    * NOTE (laziness contract): merely CONSTRUCTING the returned DataFrame
    * runs the shingle-extraction jobs eagerly — the shingle relation feeds
    * multiple differently-shaped exchanges, so it is materialized once via
    * an eager `localCheckpoint` rather than recomputed per consumer. Build
    * it only when you intend to execute (same contract as `simhashPairs`
    * and `minhash60Pairs`).
    */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.8,
                        maxShingleDf: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // one scan: explode shingles → group per shingle collecting the (bounded
    // by maxShingleDf) posting list → emit pairwise combinations locally.
    // Avoids the classic self-join's double scan/recompute of the shingle
    // lineage; posting lists are capped, so pair fan-out per group is ≤ df²/2.
    // Shingle extraction is a compiled typed flatMap: the equivalent
    // higher-order-function column chain is CodegenFallback (interpreted)
    // and gets evaluated once for size() and once for explode() — measured
    // ~20µs/shingle vs <1µs here.
    // null-text docs are dropped (cannot pair; the typed flatMap would NPE
    // where the column-based siblings null-propagate). Materialized via an
    // eager localCheckpoint because sh feeds TWO consumers with DIFFERENT
    // exchanges — the df-count agg ships partial-agg rows while the semi
    // join ships raw rows, so ReuseExchange cannot dedup them and the docs
    // scan + shingle flatMap would run twice (same multi-consumer shape and
    // fix as minhash60Pairs below).
    val sh = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        // kShingles, not an inline copy: Locale.ROOT lowering (a default-
        // locale lowercase diverges per executor JVM locale) + one source
        // of truth with the q14 oracle
        val distinctGrams = kShingles(text, k)
        distinctGrams.iterator.map(g => (id, distinctGrams.length, g))
      }.toDF("doc_id", "n_sh", "shingle").localCheckpoint(true)
    // df-prefilter BEFORE any posting list materializes: a stopword shingle
    // at web scale would otherwise build its full (huge) collect_list buffer
    // only to be discarded by the cap.
    val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxShingleDf))
    val posting = sh.join(rare.select(col("shingle")), Seq("shingle"), "left_semi")
      .groupBy(col("shingle"))
      .agg(collect_list(struct(col("doc_id"), col("n_sh"))).as("docs"))
    posting.select(col("docs")).flatMap { row =>
      val ds = row.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      for (i <- ds.indices.iterator; j <- (i + 1 until ds.length).iterator)
        yield (ds(i)._1, ds(j)._1, ds(i)._2, ds(j)._2)
    }.toDF("a", "b", "na", "nb")
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** MinHash+LSH near-dup candidate pairs (shingle → minhash → band →
    * bucket join) using spark.ml's MinHashLSH (band = hash table). Returns
    * candidate pairs with exact Jaccard distance ≤ maxDist.
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 3, maxDist: Double = 0.3,
                      numTables: Int = 8): DataFrame = {
    val sh = shingles(docs, k).filter(size(col("shingles")) > 0)
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(sh)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(42L)
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, maxDist, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"),
        round(lit(1.0) - col("dist"), 6).as("jaccard_est"))
      .filter(col("a") < col("b"))
      .distinct()
  }

  /** SimHash bit width: 60 (the md5-derived `TextAnalysis.hash60` token
    * hash) — cross-engine checkable, unlike the xxhash64-based 64-bit
    * variant this replaces.
    */
  val SimhashBits = 60

  /** 60-bit SimHash over md5-derived token hashes: bit i of the sketch =
    * sign of Σ_tokens (bit i of hash60(token) ? +1 : −1).
    *
    * Implemented as a compiled typed map, NOT column HOFs: a column
    * formulation (`transform` into a hash array + 60 per-bit `aggregate`s)
    * gets its projections collapsed by Catalyst, so the md5 transform is
    * re-evaluated once PER BIT AGGREGATE — 60× the md5 work, all
    * interpreted (measured 5s at sf0.1 vs <1s here). The DuckDB oracle
    * (SparkEntry q16) pins these exact semantics cross-engine.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null-text docs yield no sketch row (the sketch is a non-null long, so
    // SQL-style null propagation has no representation here; the typed map
    // would NPE)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, simhash60(text)) }
      .toDF("doc_id", "simhash")
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Pure-Scala mirror of `TextAnalysis.hash60`: the first 15 hex chars of
    * md5 parsed as a 60-bit integer (== big-endian first 8 bytes >>> 4).
    * Bit-identical to the column/DuckDB formulations (pinned by the q16,
    * q39, q42 oracles).
    */
  def md5Hash60(s: String): Long = {
    val d = md5Local.get().digest(s.getBytes("UTF-8")) // digest() auto-resets
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Pure-Scala mirror of the oracle's math: distinct whitespace tokens of
    * the lower-cased text; per token the 60-bit md5 hash; per-bit sign
    * votes.
    */
  def simhash60(text: String): Long = {
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).distinct
    val votes = new Array[Int](SimhashBits)
    var ti = 0
    while (ti < toks.length) {
      val h = md5Hash60(toks(ti))
      var b = 0
      while (b < SimhashBits) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1); b += 1
      }
      ti += 1
    }
    var sig = 0L
    var b = 0
    while (b < SimhashBits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** token k-shingling shared by the compiled dedup paths (same token/gram
    * rules as the `shingles` column op and the q14/q39/q42 oracles: trim →
    * lower → whitespace split → sliding k, whole-text gram when shorter).
    *
    * Lowercasing caveat: this path pins `Locale.ROOT`; the column op's SQL
    * `lower()` is locale-independent for ASCII but routes non-ASCII through
    * `String.toLowerCase()` under the executor JVM's DEFAULT locale
    * (UTF8String slow path). The two agree on all-ASCII text and on any
    * cluster whose JVMs run a root-like locale; a non-ROOT default (e.g.
    * tr_TR's dotted/dotless i) diverges on non-ASCII — pin the executor JVM
    * locale (`-Duser.language=`) in real deployments, which a heterogeneous
    * cluster needs for ANY locale-sensitive SQL function anyway.
    */
  def kShingles(text: String, k: Int): Array[String] = {
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    val grams =
      if (toks.length < k) {
        if (toks.isEmpty) Array.empty[String] else Array(toks.mkString(" "))
      } else toks.sliding(k).map(_.mkString(" ")).toArray
    grams.distinct
  }

  /** From-scratch MinHash+LSH near-dup pairs on the md5-derived hash60 —
    * engine-portable, unlike `minhashLshPairs`' spark.ml hash family.
    * Permutation i is approximated by the keyed hash
    * `hash60("<i>:<shingle>")`; signatures band into
    * `numPerms / rowsPerBand` bands; same-band-signature docs become
    * candidate pairs; exact Jaccard over the shingle sets verifies.
    *
    * Web-scale shape: the band join shuffles ONLY (band, key, doc_id) — the
    * shingle arrays never enter its exchange (plan-asserted in OpsSpec);
    * surviving candidate ids join BACK to the shingle relation for the
    * exact check. The shingle relation feeds THREE consumers (signatures +
    * two join-back sides), so it is materialized once via an eager
    * `localCheckpoint` — the production "materialized shingle column"
    * shape — instead of re-running the flatMap lineage per consumer
    * (checkpoint blocks are reclaimed by the ContextCleaner once the
    * returned plan is GC'd, unlike a cache() the caller could never
    * unpersist). Consequently merely CONSTRUCTING the returned DataFrame
    * runs the shingle jobs eagerly — build it only when you intend to
    * execute (laziness-contract note, ADVICE r4).
    */
  def minhash60Pairs(docs: DataFrame, k: Int = 3, numPerms: Int = 8,
                     rowsPerBand: Int = 2, threshold: Double = 0.5): DataFrame = {
    require(numPerms % rowsPerBand == 0, "numPerms must divide into bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs.filter(col("text").isNotNull) // typed flatMap would NPE
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val grams = kShingles(text, k)
        if (grams.isEmpty) None else Some((id, grams.toSeq))
      }.toDF("doc_id", "shingles").localCheckpoint(true)
    val sig = sh.as[(Long, Seq[String])].map { case (id, grams) =>
      (id, Seq.tabulate(numPerms)(i =>
        grams.iterator.map(g => md5Hash60(s"$i:$g")).min))
    }.toDF("doc_id", "sig")
    val nBands = numPerms / rowsPerBand
    val banded = sig.select(col("doc_id"),
      explode(array((0 until nBands).map(b => struct(lit(b).as("band"),
        slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = banded.select(col("band"), col("key"), col("doc_id").as("a"))
      .join(banded.select(col("band"), col("key"), col("doc_id").as("b")),
        Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    cand
      .join(sh.select(col("doc_id").as("a"), col("shingles").as("sa")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("shingles").as("sb")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", round(col("inter") /
        (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: block on 4 bands of 15 bits, verify Hamming
    * distance ≤ maxHamming via bit_count(xor).
    *
    * Blank/whitespace-only docs are excluded BEFORE sketching: every blank
    * doc sketches to simhash 0, so at web scale they would all share
    * identical keys in all four bands and form one quadratic mega-bucket
    * (n blank docs → ~n²/2 zero-distance pairs in one task's key group) —
    * the same hazard `shingles()` engineers out of the MinHash paths. A
    * blank doc is not a meaningful near-dup of anything; exact dedup
    * (`exact`) is the operator that groups them.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // eager localCheckpoint, not cache(): the sketch feeds both self-join
    // sides, and a cache() here can never be unpersisted by the caller (the
    // returned plan references it) — checkpoint blocks are reclaimed by the
    // ContextCleaner once the returned plan is GC'd
    val sig = simhash(docs.filter(trim(col("text")) =!= ""))
      .localCheckpoint(true)
    val bands = (0 until 4).map(bI => struct(lit(bI).as("band"),
      shiftright(col("simhash"), bI * 15).bitwiseAND(0x7fffL).as("key")))
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"), col("doc_id").as("a"),
      col("simhash").as("sa"))
    val b = banded.select(col("band"), col("key"), col("doc_id").as("b"),
      col("simhash").as("sb"))
    a.join(b, Seq("band", "key")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("int").as("hamming"))
      // filter BEFORE the distinct: hamming is a pure function of (a, b) —
      // a pair carries the same sketches in every band it collides in — so
      // the two orders are set-identical, and filtering first keeps
      // beyond-cutoff candidates out of the distinct's exchange (shuffle
      // fewer bytes). Wall-neutral on the template-heavy bench corpus,
      // where most band collisions ARE within the cutoff; on a corpus with
      // loose bands (small maxHamming, diverse near-collisions) the cut is
      // the candidate volume itself. Pinned by the q16b oracle.
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-dup pairs over (vec_id, embedding array<float>):
    * brute-force blocked by sign-LSH buckets (deterministic hyperplanes from
    * splitmix64) so only near-bucket vectors pair up; exact cosine verifies.
    *
    * Multi-probe: with `probeRadius = 1`, side A additionally probes every
    * bucket at Hamming distance 1 (flip each plane bit), so candidate pairs
    * are exactly those with bucket-Hamming ≤ 1. This is the scale shape:
    * planes can be HIGH (2^planes buckets → candidate space ~(planes+1)·n²/2^planes)
    * without losing the near-dups that straddle one hyperplane. At
    * planes=8/radius=1 the candidate space is ~n²/28 instead of the old
    * planes=4 single-probe n²/16, with strictly better recall.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.95,
                         planes: Int = 8, dim: Int = 64,
                         probeRadius: Int = 1): DataFrame = {
    // only radius 0 (own bucket) and 1 (single-bit flips) are implemented;
    // a larger radius would silently deliver radius-1 recall
    require(probeRadius <= 1,
      s"probeRadius > 1 is not implemented (got $probeRadius); use more planes instead")
    val withBucket = Similarity.withSignBucket(emb, planes, dim)
    val probes =
      if (probeRadius <= 0) array(col("bucket"))
      else array((col("bucket") +:
        (0 until planes).map(p => col("bucket").bitwiseXOR(lit(1L << p)))): _*)
    val a = withBucket.select(col("vec_id").as("a"), col("embedding").as("ea"),
      explode(probes).as("bucket"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("b"),
      col("embedding").as("eb"))
    // each (a<b) pair joins on exactly one probe bucket (a's own bucket when
    // Hamming=0, the single flipped bit when Hamming=1) — no duplicate pairs
    a.join(b, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cos", Similarity.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
      .distinct()
  }
}
