package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.core._

/** Unit tests for the pure-Scala core, pinned to the reference semantics
  * (lexicon_tree.py / label.py / vocab.py / crf.py) with hand-computed
  * cases plus seeded randomized property loops (SURVEY.md §5.2; the
  * scalatestplus-scalacheck bridge is absent from the offline cache, so
  * properties run on seeded `scala.util.Random`).
  */
class TrieSpec extends AnyFunSuite {
  test("insert/search") {
    val t = Trie(Seq("ab", "abc", "b"))
    assert(t.search("ab") && t.search("abc") && t.search("b"))
    assert(!t.search("a") && !t.search("abcd") && !t.search(""))
    assert(t.maxDepth == 3)
  }

  test("enumerateMatch returns all prefixes, single-char demoted (lexicon_tree.py:94-95)") {
    val t = Trie(Seq("a", "ab", "abc", "x"))
    assert(t.enumerateMatch("abcd", 0) == List("ab", "abc"))
    assert(t.enumerateMatch("axy", 1) == List("x"))
    assert(t.enumerateMatch("zzz", 0) == Nil)
  }

  test("useSingle=false drops length-1 matches entirely (minLen=1)") {
    val t = new Trie(useSingle = false)
    t.insert("a").insert("ab")
    assert(t.enumerateMatch("ab", 0) == List("ab"))
    assert(t.enumerateMatch("a", 0) == Nil)
  }

  test("getAllMatchedWordList coverage + single-char suppression (lexicon_tree.py:114-129)") {
    val t = Trie(Seq("ab", "bc", "c"))
    val m = t.getAllMatchedWordList("abc")
    assert(m(0) == List("ab"))
    assert(m(1) == List("ab", "bc"))
    // "c" appended after coverage "bc": matched(2) non-empty + len-1 → suppressed
    assert(m(2) == List("bc"))
  }

  test("single-char kept when position otherwise empty") {
    val t2 = Trie(Seq("c"))
    assert(t2.getAllMatchedWordList("abc")(2) == List("c"))
  }

  test("max_words cap applied pre-coverage and at end (lexicon_tree.py:119-120,127-128)") {
    val t = Trie(Seq("a", "ab", "abc", "abcd", "abcde"))
    val m = t.getAllMatchedWordList("abcde", maxWords = 2)
    assert(m.forall(_.length <= 2))
  }

  test("getAllMatchedWords sorted distinct") {
    val t = Trie(Seq("ab", "bc", "ab"))
    assert(t.getAllMatchedWords("abcab") == Seq("ab", "bc"))
  }

  test("insert after the walk index froze fails loudly (stale root index)") {
    val t = Trie(Seq("ab"))
    assert(t.rootChild('a') != null) // freezes the root index
    val e = intercept[IllegalStateException] { t.insert("xy") }
    assert(e.getMessage.contains("frozen"))
  }

  test("property: every enumerated match is a dictionary word and prefix at position") {
    val rnd = new Random(42)
    def word = (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 1 to 200) {
      val ws = List.fill(rnd.nextInt(6))(word)
      val sent = List.fill(rnd.nextInt(5))(word).mkString
      val t = Trie(ws)
      for (i <- 0 until sent.length; m <- t.enumerateMatch(sent, i)) {
        assert(ws.contains(m), s"$m not in $ws")
        assert(sent.startsWith(m, i))
      }
    }
  }

  test("property: matchSpans finds every planted multi-char word occurrence") {
    val rnd = new Random(7)
    def word = (1 to (2 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 1 to 200) {
      val ws = List.fill(1 + rnd.nextInt(5))(word)
      val sent = ws.mkString("")
      val t = Trie(ws)
      val spans = t.matchSpans(sent).toSet
      var off = 0
      for (w <- ws) {
        assert(spans.contains((off, w)), s"missing ($off,$w) in $sent")
        off += w.length
      }
    }
  }
}

class TagsSpec extends AnyFunSuite {
  test("getEntities basic BMES decode (label.py:11-44)") {
    val tags = IndexedSeq("O", "B-LOC", "E-LOC", "O", "S-PER")
    val spans = Tags.getEntities(tags, "坐福州落于")
    assert(spans == List(Span(1, 3, "LOC", "福州"), Span(4, 5, "PER", "于")))
  }

  test("trailing open entity flushed by sentinel") {
    val spans = Tags.getEntities(IndexedSeq("O", "B-ORG", "I-ORG"), "xab")
    assert(spans == List(Span(1, 3, "ORG", "ab")))
  }

  test("M/I without B recovery branch (label.py:28-32)") {
    val spans = Tags.getEntities(IndexedSeq("I-PER", "I-PER", "O"), "abc")
    assert(spans == List(Span(0, 2, "PER", "ab")))
  }

  test("adjacent entities split on B") {
    val spans = Tags.getEntities(IndexedSeq("B-PER", "E-PER", "B-PER", "E-PER"), "abcd")
    assert(spans == List(Span(0, 2, "PER", "ab"), Span(2, 4, "PER", "cd")))
  }

  test("getLabels (label.py:47-55)") {
    assert(Tags.getLabels("PER", 1).toSeq == Seq("S-PER"))
    assert(Tags.getLabels("ORG", 3).toSeq == Seq("B-ORG", "I-ORG", "E-ORG"))
    assert(Tags.getLabels("ORG", 2, hasEnd = false).toSeq == Seq("B-ORG", "I-ORG"))
  }

  test("normalizeMI") {
    assert(Tags.normalizeMI("M-PER") == "I-PER")
    assert(Tags.normalizeMI("B-PER") == "B-PER")
    assert(Tags.normalizeMI("O") == "O")
  }

  test("property: render→extract fixpoint recovers planted spans") {
    val rnd = new Random(11)
    val labels = Vector("PER", "ORG", "LOC")
    for (_ <- 1 to 300) {
      val tags = scala.collection.mutable.ArrayBuffer.fill(rnd.nextInt(3))("O")
      val expected = scala.collection.mutable.ListBuffer.empty[(Int, Int, String)]
      for (_ <- 0 until rnd.nextInt(4)) {
        val lbl = labels(rnd.nextInt(3)); val len = 1 + rnd.nextInt(4)
        val start = tags.length
        tags ++= Tags.getLabels(lbl, len)
        expected += ((start, start + len, lbl))
        tags ++= Seq.fill(1 + rnd.nextInt(2))("O")
      }
      val text = "x" * tags.length
      val got = Tags.getEntities(tags.toIndexedSeq, text).map(s => (s.start, s.end, s.label))
      assert(got == expected.toList)
    }
  }
}

class ViterbiSpec extends AnyFunSuite {
  private def bruteForce(em: Array[Array[Float]], tr: Array[Array[Float]]): Float = {
    val L = em.length; val C = em(0).length
    def go(l: Int): Seq[List[Int]] =
      if (l == 0) Seq(Nil) else for (p <- go(l - 1); c <- 0 until C) yield c :: p
    go(L).map(p => Viterbi.score(p.reverse.toArray, em, tr)).max
  }

  test("decode matches brute force on random small instances") {
    val rnd = new Random(5)
    for (_ <- 1 to 150) {
      val l = 1 + rnd.nextInt(5); val c = 2 + rnd.nextInt(3)
      val em = Array.fill(l, c)(rnd.nextFloat() * 10 - 5)
      val tr = Array.fill(c + 2, c + 2)(rnd.nextFloat() * 10 - 5)
      val dec = Viterbi.decode(em, tr)
      assert(math.abs(Viterbi.score(dec, em, tr) - bruteForce(em, tr)) < 1e-3f)
    }
  }

  test("sparse BMES decode is path-identical to dense, ties included") {
    val tags = graft.synth.Transcripts.tagSet
    val tr = Viterbi.bmesTransitions(tags)
    val sp = Viterbi.SparseBmes.build(tr).get
    val C = tags.length
    val rnd = new Random(11)
    for (_ <- 1 to 300) {
      val l = 1 + rnd.nextInt(30)
      val s1 = new Viterbi.Scratch(l, C)
      val s2 = new Viterbi.Scratch(l, C)
      // vote-shaped non-negative emissions from {0, 0.1, 1} — deliberately
      // tie-heavy to stress argmax tie-break equality, and within the
      // emission-mass precondition (≤ 30·2 ≪ 5000)
      for (t <- 0 until l; c <- 0 until C) {
        val v = rnd.nextInt(10) match {
          case 0 | 1 => 1f
          case 2     => 0.1f
          case _     => 0f
        }
        s1.emissions(t * C + c) = v
        s2.emissions(t * C + c) = v
      }
      Viterbi.decodeScratch(s1, l, tr)
      Viterbi.decodeScratchSparse(s2, l, sp)
      assert(s1.path.take(l).toSeq == s2.path.take(l).toSeq)
    }
  }

  test("SparseBmes.build accepts only 0/Impossible matrices with full rows") {
    val tags = graft.synth.Transcripts.tagSet
    assert(Viterbi.SparseBmes.build(Viterbi.bmesTransitions(tags)).isDefined)
    // arbitrary finite scores → not sparse-safe
    val rnd = new Random(7)
    val dense = Array.fill(5, 5)(rnd.nextFloat())
    assert(Viterbi.SparseBmes.build(dense).isEmpty)
    // a row with zero kept predecessors → dense computes a finite pruned max
    val allImpossible = Array.fill(5, 5)(Viterbi.Impossible)
    assert(Viterbi.SparseBmes.build(allImpossible).isEmpty)
  }

  test("BMES transitions keep decoded paths grammatical") {
    val tags = graft.synth.Transcripts.tagSet
    val tr = Viterbi.bmesTransitions(tags)
    val rnd = new Random(3)
    for (_ <- 1 to 100) {
      val l = 1 + rnd.nextInt(8)
      val em = Array.fill(l, tags.length)(rnd.nextFloat() * 5)
      val path = Viterbi.decode(em, tr).map(tags)
      // grammar: I/M/E must continue the same type from B/I/M; B/I/M cannot
      // be followed by O/B/S of a different run; sequence ends on E/S/O
      var open: String = null
      for (tag <- path) {
        tag.charAt(0) match {
          case 'B' => assert(open == null); open = Tags.typeOf(tag)
          case 'S' => assert(open == null)
          case 'O' => assert(open == null)
          case 'I' | 'M' => assert(open == Tags.typeOf(tag))
          case 'E' => assert(open == Tags.typeOf(tag)); open = null
        }
      }
      assert(open == null, s"unterminated entity in ${path.mkString(",")}")
    }
  }
}

class VocabSpec extends AnyFunSuite {
  test("length-bucketed unk (vocab.py:96-101)") {
    val v = Vocab(Seq("foo", "ba"), isWord = true, unkNum = 3)
    assert(v.token(v.id("xyz")) == "<unk>3")
    assert(v.token(v.id("xy")) == "<unk>2")
    assert(v.token(v.id("xyzzy")) == "<unk>")
  }

  test("VocabTag tag lookup with unk fallback (vocab_tag.py:24-37)") {
    val vt = VocabTag(Seq("ab" -> Array("B-PER", "E-PER")), hasDefault = false, unkNum = 2)
    assert(vt.tag("ab").toSeq == Seq("B-PER", "E-PER"))
    // reference quirk (vocab_tag.py:21): the <unk>k entry's default tag list
    // has len("<unk>k") entries, not k — we reproduce it bit-exactly
    assert(vt.tag("xy").toSeq == Seq.fill("<unk>2".length)("O"))
  }

  test("insertion order ids") {
    val v = Vocab(Seq("x", "y"), isWord = false)
    assert(v.id("x") == 0 && v.id("y") == 1)
    intercept[NoSuchElementException](v.id("z"))
  }
}
