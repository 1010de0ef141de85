package graft.core

import scala.collection.mutable

/** Character-level lexicon trie.
  *
  * Semantics transliterated from the reference implementation
  * (`CC/loaders/utils/lexicon_tree.py:14-129`), bit-exact on:
  *   - `enumerateMatch` depth cut at `max_depth` and the single-character
  *     demotion rule (drop the length-1 match when longer matches exist,
  *     lexicon_tree.py:94-95);
  *   - `getAllMatchedWordList` coverage propagation (a word starting at i
  *     is appended to every covered position j in (i, i+len) first, then to
  *     position i unless i already has matches and the word is length-1,
  *     lexicon_tree.py:121-126) and the per-position cap applied both
  *     before coverage fill and at the end (lexicon_tree.py:119-120,127-128).
  *
  * The structure is built once on the driver from the (bounded, `limit`-ed)
  * vocabulary and shipped to executors via `SparkContext.broadcast`; at
  * 1.5M words it serializes to tens of MB, well under broadcast limits.
  * Matching happens inside `mapPartitions`, never per-row on the driver.
  *
  * ==Build-then-freeze contract (deviation from lexicon_tree.py)==
  * The FIRST query (`search` / `enumerateMatch` / `rootChild` / any walk)
  * freezes the root index and per-node child views; `insert` AFTER that
  * throws `IllegalStateException` rather than leave a stale root index that
  * would silently miss the new word's first char. The reference allows
  * interleaved insert/query; this class trades that for the frozen walk
  * arrays the detect hot path needs. Build the trie fully (e.g. via
  * `Trie(words)`) before first use — every in-repo call site does.
  */
final class Trie(useSingle: Boolean = true) extends Serializable {

  /** A node's frozen read view: parallel sorted (char, child) arrays. A
    * dedicated holder whose fields are FINAL, so JMM final-field semantics
    * give safe unsynchronized publication: any thread that observes the
    * holder reference observes fully-initialized arrays (built before the
    * constructor ran). Detect walkers are already safe via the `rootIndex`
    * lazy-val monitor; this hardens the OTHER read paths (`search` /
    * `enumerateMatch` on a trie a detect walk is concurrently freezing) —
    * with the old two-mutable-field pair such a reader could observe one
    * array without the other (NPE) or an array reference before its
    * element writes (silent wrong miss).
    */
  private[Trie] final class FrozenChildren(val ck: Array[Char],
                                           val cn: Array[Node])

  final class Node extends Serializable {
    var children: mutable.HashMap[Char, Node] = null // lazily allocated
    var isWord: Boolean = false
    /** the full word ending at this terminal — lets match loops emit the
      * dictionary-owned string instead of allocating a substring per hit
      */
    var word: String = null
    // frozen read view (built by the rootIndex freeze): a linear char scan
    // over a tiny fanout beats HashMap.getOrElse (no Char boxing, no hash)
    // on the detect walk. Transient — executors rebuild lazily after
    // broadcast deserialization. A racing reader that still sees null just
    // takes the HashMap path (correct, the map is frozen-read-only).
    @transient private[Trie] var fz: FrozenChildren = null
    def child(c: Char): Node = {
      val f = fz
      if (f != null) {
        val k = f.ck
        var i = 0
        while (i < k.length) { if (k(i) == c) return f.cn(i); i += 1 }
        null
      } else if (children == null) null
      else children.getOrElse(c, null)
    }
  }

  val root = new Node

  /** First-level child index: a direct char-indexed array replacing the
    * root HashMap lookup on the detect hot path — the walk probes the root
    * once per TEXT POSITION and the dominant case is a miss, so one array
    * load (no Char boxing, no hash) beats `HashMap.getOrElse` there. Built
    * lazily once per JVM (also after broadcast deserialization); 64k refs
    * ≈ 512 KB per executor. Pure view of `root.children` — build the trie
    * fully before first use (the detect stage always does: the trie is
    * constructed on the driver, then broadcast).
    */
  /** Frozen root probe for hot walkers: `bits` is an 8 KB presence bitset
    * (65536 bits — fully L1-resident), `nodes` the 512 KB char-indexed ref
    * array. The detect walk probes the root once per TEXT POSITION and the
    * dominant case on natural-language corpora is a MISS: answering misses
    * from the bitset keeps the hot probe inside L1 instead of striding the
    * ref array (only hits pay the `nodes` load). Final fields → JMM-safe
    * unsynchronized publication, same contract as [[FrozenChildren]].
    */
  final class RootView private[Trie] (private val bits: Array[Long],
                                      private val nodes: Array[Node],
                                      private val lo: Char, private val hi: Char) {
    // three-tier probe: [lo,hi] range gate (two register compares, no memory
    // load — on a natural-language corpus with a capitalized-entity lexicon
    // most positions die here), then the bitset, then the ref array. A trie
    // whose first chars span the whole alphabet degrades gracefully: the
    // gate passes everything and the bitset still bounds the miss cost.
    @inline def child(c: Char): Node =
      if (c < lo || c > hi || ((bits(c >>> 6) >>> (c & 63)) & 1L) == 0L) null
      else nodes(c)
  }

  @transient private lazy val rootIndex: RootView = {
    // freeze every node's child map into parallel sorted arrays while here —
    // the lazy val's one-time init (synchronized, safely published) makes
    // the whole-trie freeze thread-safe for the task threads that share the
    // broadcast instance
    def freeze(n: Node): Unit = if (n.children != null) {
      val ks = n.children.keysIterator.toArray.sorted
      val ns = ks.map(n.children)
      n.fz = new FrozenChildren(ks, ns) // arrays complete BEFORE the ctor
      ns.foreach(freeze)
    }
    freeze(root)
    val arr = new Array[Node](Char.MaxValue + 1)
    val bits = new Array[Long]((Char.MaxValue + 1) / 64)
    var lo = Char.MaxValue
    var hi = Char.MinValue
    if (root.children != null) root.children.foreach { case (c, n) =>
      arr(c) = n
      bits(c >>> 6) |= 1L << (c & 63)
      if (c < lo) lo = c
      if (c > hi) hi = c
    }
    rootIndexBuilt = true
    new RootView(bits, arr, lo, hi) // empty trie: lo > hi gates everything out
  }
  @transient private var rootIndexBuilt = false
  /** The frozen root view (triggers the one-time freeze) — hot walkers
    * hoist this once per partition/turn instead of re-entering the lazy-val
    * accessor per char.
    */
  def rootView: RootView = rootIndex
  def rootChild(c: Char): Node = rootIndex.child(c)

  var maxDepth: Int = 0
  /** min match index: 0 keeps single-char words, 1 drops them (lexicon_tree.py:26-29). */
  val minLen: Int = if (useSingle) 0 else 1
  private var nWords: Int = 0

  def size: Int = nWords

  def insert(word: String): this.type = {
    // insert() invalidates per-node frozen views along its path, but the
    // root's char-indexed array (rootIndex) is built ONCE — an insert after
    // a walk has frozen it would leave a stale root index that silently
    // misses the new word's first char. Fail loudly instead: build the trie
    // fully before the first walk (every call site does).
    if (rootIndexBuilt) throw new IllegalStateException(
      "Trie.insert after the walk index was frozen — build the trie fully before first use")
    var ptr = root
    var deep = 0
    var k = 0
    while (k < word.length) {
      if (ptr.children == null) ptr.children = mutable.HashMap.empty
      ptr.fz = null // invalidate any frozen view on this path
      ptr = ptr.children.getOrElseUpdate(word.charAt(k), new Node)
      deep += 1
      k += 1
    }
    if (!ptr.isWord) nWords += 1
    ptr.isWord = true
    ptr.word = word
    if (deep > maxDepth) maxDepth = deep
    this
  }

  def search(word: String): Boolean = {
    if (word.isEmpty) return root.isWord
    // first step through the char-indexed root array (triggers the one-time
    // freeze; root.child(c) ≡ rootChild(c) by construction)
    var ptr = rootChild(word.charAt(0))
    var k = 1
    while (ptr != null && k < word.length) {
      ptr = ptr.child(word.charAt(k))
      k += 1
    }
    ptr != null && ptr.isWord
  }

  /** All lexicon words that are prefixes of `sent` starting at `from`
    * (reference passes the suffix; we pass an offset to avoid substring
    * allocation in the hot loop — same result).
    * Mirrors lexicon_tree.py:74-96 including the `i > max_depth` cut and
    * the single-char demotion when more than one match exists.
    */
  def enumerateMatch(sent: CharSequence, from: Int): List[String] = {
    var matched: List[String] = Nil
    val n = sent.length - from
    if (n <= 0 || maxDepth < 0) return Nil
    // first step through the char-indexed root array (triggers the one-time
    // freeze; root.child(c) ≡ rootChild(c), and the i=0 `i > maxDepth` cut
    // can only fire on an empty trie, where maxDepth = 0 and the root array
    // is all null — same result)
    var ptr = rootChild(sent.charAt(from))
    var i = 0
    while (ptr != null) {
      if (i >= minLen && ptr.isWord)
        matched = ptr.word :: matched // dictionary-owned string, no substring alloc
      i += 1
      // same cut order as before: depth limit checked before the child
      // lookup at depth i
      ptr = if (i < n && i <= maxDepth) ptr.child(sent.charAt(from + i))
            else null
    }
    val res = matched.reverse
    res match {
      case first :: rest if rest.nonEmpty && first.length == 1 => rest
      case _ => res
    }
  }

  def enumerateMatch(sent: String): List[String] = enumerateMatch(sent, 0)

  /** Sorted distinct matched words over a whole text (lexicon_tree.py:98-112). */
  def getAllMatchedWords(sent: String): Seq[String] = {
    val set = mutable.TreeSet.empty[String]
    var i = 0
    while (i < sent.length) {
      enumerateMatch(sent, i).foreach(set.add)
      i += 1
    }
    set.toSeq
  }

  /** Per-position matched-word lists (lexicon_tree.py:114-129). */
  def getAllMatchedWordList(sent: String, maxWords: Int = -1): Array[List[String]] = {
    val matched = Array.fill(sent.length)(mutable.ListBuffer.empty[String])
    var i = 0
    while (i < sent.length) {
      var words = enumerateMatch(sent, i)
      if (maxWords >= 0) words = words.take(maxWords)
      for (word <- words) {
        var j = i + 1
        while (j < i + word.length) { matched(j) += word; j += 1 }
        if (!(matched(i).nonEmpty && word.length == 1)) matched(i) += word
      }
      if (maxWords >= 0 && matched(i).length > maxWords)
        matched(i) = matched(i).take(maxWords).to(mutable.ListBuffer)
      i += 1
    }
    matched.map(_.toList)
  }

  /** All (start, word) matches over a text — the span-oriented view the
    * mention-detection stage consumes (begin-position enumeration like
    * getAllMatchedWordList's outer loop, keeping offsets).
    */
  def matchSpans(sent: String): List[(Int, String)] = {
    val out = mutable.ListBuffer.empty[(Int, String)]
    var i = 0
    while (i < sent.length) {
      enumerateMatch(sent, i).foreach(w => out += ((i, w)))
      i += 1
    }
    out.toList
  }
}

object Trie {
  def apply(words: IterableOnce[String], useSingle: Boolean = true): Trie = {
    val t = new Trie(useSingle)
    words.iterator.foreach(t.insert)
    t
  }
}
