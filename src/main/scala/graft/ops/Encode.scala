package graft.ops

import graft.core.{Trie, Vocab}

/** Micro-batch tensor-prep transforms (SURVEY.md §2.2/§2.3 "scatter" tier):
  * the per-sentence framing/encoding/padding/masking the reference performs
  * before model input (`CC/loaders/le_loader.py:144-193`,
  * `cn_data_manager.py:244-269`). These are pure functions executed inside
  * the inference `mapPartitions` — they never materialize as table columns
  * (D8 note in SURVEY §1.1) — but their semantics are pinned here so the
  * ONNX-serving swap reproduces the reference's exact tensor layout.
  */
object Encode {
  val Cls = "[CLS]"; val Sep = "[SEP]"; val Pad = "<pad>"

  /** Truncate to maxSeqLength-2 and frame with [CLS]/[SEP]
    * (le_loader.py:146-154).
    */
  def truncateAndFrame(chars: Seq[String], maxSeqLength: Int): Seq[String] =
    Cls +: chars.take(maxSeqLength - 2) :+ Sep

  /** Token→id with OOV→unk-bucket lookup (cn_data_manager.py:46-54). */
  def encode(tokens: Seq[String], vocab: Vocab): Array[Int] =
    tokens.map(vocab.id).toArray

  /** Id→token, stopping at the first pad (cn_data_manager.py:56-66). */
  def decode(ids: Seq[Int], vocab: Vocab): Seq[String] =
    ids.iterator.map(vocab.token).takeWhile(_ != Pad).toSeq

  /** Right-pad to fixed length (cn_data_manager.py:244-269). */
  def pad(ids: Array[Int], length: Int, padId: Int = 0): Array[Int] =
    if (ids.length >= length) ids.take(length)
    else ids ++ Array.fill(length - ids.length)(padId)

  /** attention mask: 1 where id > 0 (le_loader.py:163-167). */
  def attentionMask(ids: Array[Int]): Array[Int] = ids.map(i => if (i > 0) 1 else 0)

  /** token_type ids: 0 up to and incl. first [SEP], 1 after
    * (cnx_loader.py:207-221 two-segment layout).
    */
  def tokenTypeIds(tokens: Seq[String]): Array[Int] = {
    val firstSep = tokens.indexOf(Sep)
    tokens.indices.map(i => if (firstSep >= 0 && i > firstSep) 1 else 0).toArray
  }

  /** matched-word-id scatter: [L][W] ids + mask from per-position match
    * lists (le_loader.py:174-181), W = maxWordNum (default 5,
    * le_loader.py:28).
    */
  def matchedWordIds(matched: Array[List[String]], vocab: Vocab,
                     maxWordNum: Int = 5): (Array[Array[Int]], Array[Array[Int]]) = {
    val ids = Array.ofDim[Int](matched.length, maxWordNum)
    val mask = Array.ofDim[Int](matched.length, maxWordNum)
    for (i <- matched.indices; (w, j) <- matched(i).take(maxWordNum).zipWithIndex) {
      ids(i)(j) = vocab.id(w)
      mask(i)(j) = 1
    }
    (ids, mask)
  }

  /** Full per-sentence conversion: the le_loader `convert_embedding`
    * contract (truncate→frame→encode→match→scatter→pad+mask), returned as a
    * single micro-batch row.
    */
  final case class EncodedRow(inputIds: Array[Int], attentionMask: Array[Int],
                              tokenTypeIds: Array[Int],
                              matchedWordIds: Array[Array[Int]],
                              matchedWordMask: Array[Array[Int]])

  def convert(text: String, charVocab: Vocab, wordVocab: Vocab, trie: Trie,
              maxSeqLength: Int, maxWordNum: Int = 5): EncodedRow = {
    val framed = truncateAndFrame(text.map(_.toString), maxSeqLength)
    val ids = pad(encode(framed, charVocab), maxSeqLength)
    // matched-word lists over the raw (unframed) chars, shifted by the [CLS]
    // offset like le_loader.py:174-181
    val matchedRaw = trie.getAllMatchedWordList(
      text.take(maxSeqLength - 2), maxWordNum)
    val matched = Array.fill(maxSeqLength)(List.empty[String])
    for (i <- matchedRaw.indices if i + 1 < maxSeqLength)
      matched(i + 1) = matchedRaw(i)
    val (mw, mm) = matchedWordIds(matched, wordVocab, maxWordNum)
    EncodedRow(ids, attentionMask(ids),
      pad(tokenTypeIds(framed), maxSeqLength), mw, mm)
  }
}
