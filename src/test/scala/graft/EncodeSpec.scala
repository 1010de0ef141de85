package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Trie, Vocab}
import graft.ops.Encode

class EncodeSpec extends AnyFunSuite {
  private val charVocab = Vocab(
    Seq("[CLS]", "[SEP]") ++ "abcdef".map(_.toString), isWord = true)
  private val wordVocab = Vocab(Seq("ab", "bc", "cd"), isWord = true, unkNum = 2)

  test("truncate + frame (le_loader.py:146-154)") {
    val framed = Encode.truncateAndFrame("abcdef".map(_.toString), maxSeqLength = 5)
    assert(framed == Seq("[CLS]", "a", "b", "c", "[SEP]"))
  }

  test("encode/decode round trip stops at pad (cn_data_manager.py:46-66)") {
    val ids = Encode.encode(Seq("a", "b"), charVocab)
    val padded = Encode.pad(ids, 5, padId = charVocab.id("<pad>"))
    assert(padded.length == 5)
    assert(Encode.decode(padded.toIndexedSeq, charVocab) == Seq("a", "b"))
  }

  test("attention mask and token types (le_loader.py:163-173)") {
    val ids = Array(3, 4, 5, 0, 0)
    assert(Encode.attentionMask(ids).toSeq == Seq(1, 1, 1, 0, 0))
    val tt = Encode.tokenTypeIds(Seq("[CLS]", "a", "[SEP]", "b", "[SEP]"))
    assert(tt.toSeq == Seq(0, 0, 0, 1, 1))
  }

  test("matched-word scatter fills [L][W] ids+mask (le_loader.py:174-181)") {
    val matched = Array(List("ab"), List("ab", "bc"), List.empty[String])
    val (ids, mask) = Encode.matchedWordIds(matched, wordVocab, maxWordNum = 2)
    assert(ids(0)(0) == wordVocab.id("ab") && mask(0).toSeq == Seq(1, 0))
    assert(mask(1).toSeq == Seq(1, 1))
    assert(mask(2).toSeq == Seq(0, 0))
  }

  test("full convert produces reference tensor layout (le_loader convert_embedding)") {
    val trie = Trie(Seq("ab", "bc"))
    val row = Encode.convert("abc", charVocab, wordVocab, trie,
      maxSeqLength = 6, maxWordNum = 2)
    assert(row.inputIds.length == 6)
    assert(row.attentionMask.toSeq == Seq(1, 1, 1, 1, 1, 0))
    // matched words shifted by [CLS]: position 1 holds matches for char 0
    assert(row.matchedWordMask(1).toSeq == Seq(1, 0)) // "ab" at char 0
    assert(row.matchedWordMask(2).toSeq == Seq(1, 1)) // covered by ab + bc starts
    assert(row.matchedWordIds(1)(0) == wordVocab.id("ab"))
  }
}
