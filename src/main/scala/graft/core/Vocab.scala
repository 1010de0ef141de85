package graft.core

import scala.collection.mutable

/** Insertion-ordered token↔id bimap with length-bucketed UNKs, per the
  * reference (`CC/loaders/utils/vocab.py:13-34, 80-104`): reserved
  * `<pad>`, `<unk>`, optional `<unk>1..<unk>k`; an OOV word of length k
  * maps to `<unk>k` when that bucket exists, else `<unk>`.
  */
final class Vocab(val isWord: Boolean) extends Serializable {
  private val token2id = mutable.LinkedHashMap.empty[String, Int]
  private val idList = mutable.ArrayBuffer.empty[String]

  def add(token: String): this.type = {
    if (!token2id.contains(token)) {
      token2id(token) = idList.length
      idList += token
    }
    this
  }

  def size: Int = idList.length
  def contains(token: String): Boolean = token2id.contains(token)
  def tokens: Seq[String] = idList.toSeq

  /** vocab.py:80-104: exact hit, else `<unk>{len}` bucket, else `<unk>`. */
  def id(token: String): Int =
    token2id.get(token) match {
      case Some(i) => i
      case None if isWord =>
        token2id.get(s"<unk>${token.length}")
          .orElse(token2id.get("<unk>"))
          .getOrElse(throw new NoSuchElementException(s"token '$token' and <unk> both absent"))
      case None =>
        throw new NoSuchElementException(s"token '$token' does not exist")
    }

  def token(id: Int): String = idList(id)
}

object Vocab {
  /** vocab.py:13-34 defaults: `<pad>`, `<unk>`, `<unk>1..<unk>n`. */
  def apply(words: IterableOnce[String], isWord: Boolean = true,
            hasDefault: Boolean = false, unkNum: Int = 0): Vocab = {
    val v = new Vocab(isWord)
    if (!hasDefault && isWord) {
      v.add("<pad>").add("<unk>")
      (1 to unkNum).foreach(i => v.add(s"<unk>$i"))
    }
    words.iterator.foreach(v.add)
    v
  }
}

/** Vocab + token→tags map — the alias/weak-label dictionary
  * (`CC/loaders/utils/vocab_tag.py:7-37`): a token maps to its recorded
  * per-char tag list; OOV falls back to `<unk>{len}` then `<unk>` buckets.
  * In the Spark pipeline this is the broadcast entity-linking candidate
  * dictionary (`surface → (entityId, label)`).
  */
final class VocabTag(val defaultTag: String = "O") extends Serializable {
  private val token2tag = mutable.HashMap.empty[String, Array[String]]
  val vocab = new Vocab(true)
  var isWord: Boolean = true

  def add(token: String, tags: Array[String]): this.type = {
    vocab.add(token)
    token2tag(token) = tags
    this
  }

  /** vocab_tag.py:13-22 single-token branch: default tag per char. */
  def add(token: String): this.type = add(token, Array.fill(token.length)(defaultTag))

  def contains(token: String): Boolean = token2tag.contains(token)

  /** vocab_tag.py:24-37. */
  def tag(token: String): Array[String] =
    token2tag.getOrElse(token,
      if (isWord)
        token2tag.getOrElse(s"<unk>${token.length}",
          token2tag.getOrElse("<unk>",
            throw new NoSuchElementException(s"token '$token' does not exist")))
      else throw new NoSuchElementException(s"token '$token' does not exist"))

  def tagOption(token: String): Option[Array[String]] = token2tag.get(token)
}

object VocabTag {
  /** vocab_tag.py:39-56 with defaults `<pad>`/`<unk>{0..n}` when word-mode. */
  def apply(entries: IterableOnce[(String, Array[String])],
            hasDefault: Boolean = false, unkNum: Int = 0): VocabTag = {
    val v = new VocabTag()
    if (!hasDefault) {
      v.add("<pad>"); v.add("<unk>")
      (1 to unkNum).foreach(i => v.add(s"<unk>$i"))
    }
    entries.iterator.foreach { case (t, tags) => v.add(t, tags) }
    v
  }
}
