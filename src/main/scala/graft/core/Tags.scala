package graft.core

import scala.collection.mutable

/** An extracted entity span; `end` is exclusive, char offsets into the turn
  * text (reference `CC/loaders/utils/label.py:11-44` tuple
  * `(start, end, label, word)`).
  */
final case class Span(start: Int, end: Int, label: String, surface: String)

/** BMES/BIO tag codec, transliterated from the reference
  * (`CC/loaders/utils/label.py`):
  *   - `getEntities` = `get_entities` (label.py:11-44) including the
  *     guard-sentinel close (a trailing virtual "B-" flushes the last open
  *     entity) and the M/I-without-B recovery branch (label.py:28-32);
  *   - `getLabels` = `get_labels` (label.py:47-55);
  *   - `normalizeMI` = the M-→I- projection applied before scoring
  *     (`CC/trainer.py:211-214`).
  */
object Tags {
  private val Start = Set('B')
  private val Middle = Set('M', 'I')
  private val Single = Set('S')
  private val Outside = Set('O')

  def typeOf(tag: String): String = {
    val i = tag.indexOf('-')
    if (i < 0) "" else tag.substring(i + 1)
  }

  /** Extract entity spans from a per-char tag sequence. `tags` and `text`
    * must have equal length (enforced upstream, `cn_loader.py:91-102`).
    */
  def getEntities(tags: IndexedSeq[String], text: String): List[Span] = {
    require(tags.length == text.length, s"tags(${tags.length}) != text(${text.length})")
    val out = mutable.ListBuffer.empty[Span]
    val word = new StringBuilder
    var curLabel: String = null
    var start = -1
    var i = 0
    val n = tags.length + 1 // virtual trailing "B-" sentinel (label.py:16-17)
    while (i < n) {
      val tag = if (i < tags.length) tags(i) else "B-"
      val head = if (tag.isEmpty) 'O' else tag.charAt(0)
      if (Start(head) || Outside(head) || Single(head)) {
        if (curLabel != null) out += Span(start, i, curLabel, word.result())
        word.clear(); curLabel = null; start = -1
      }
      if (Start(head) || Single(head)) { curLabel = typeOf(tag); start = i }
      if (Middle(head) && curLabel == null) { curLabel = typeOf(tag); start = i }
      if (!Outside(head) && i < tags.length) word.append(text.charAt(i))
      i += 1
    }
    out.toList
  }

  /** BMES label sequence for an entity of `length` chars (label.py:47-55).
    * `length ≤ 0` fails loudly — the reference raises IndexError there too
    * (`labels[-1]` on an empty list), but with no hint which caller passed
    * a degenerate span.
    */
  def getLabels(label: String, length: Int, hasEnd: Boolean = true,
                middleSymbol: String = "I", hasSingle: Boolean = true): Array[String] = {
    require(length > 0, s"getLabels('$label', $length): length must be ≥ 1")
    val labels = Array.fill(length)(s"$middleSymbol-$label")
    if (length == 1 && hasSingle) { labels(0) = s"S-$label"; return labels }
    if (hasEnd) labels(length - 1) = s"E-$label"
    labels(0) = s"B-$label"
    labels
  }

  /** `M-TYPE` → `I-TYPE` normalization before span scoring (trainer.py:211-214). */
  def normalizeMI(tag: String): String =
    if (tag.startsWith("M-")) "I-" + tag.substring(2) else tag
}
