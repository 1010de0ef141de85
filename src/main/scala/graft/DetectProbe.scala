package graft

import graft.core._
import graft.stages.LexiconCrfTagger
import graft.synth.Transcripts

/** Throwaway attribution probe for the detect single-thread budget: times
  * (a) the bare trie walk, (b) walk + emission fill, (c) full spanOne, on
  * the same turn sample DetectMicro uses. Diagnostic only.
  */
object DetectProbe {
  def main(args: Array[String]): Unit = {
    val nTurns = if (args.length > 0) args(0).toInt else 1000000
    val texts = new Array[String](nTurns)
    var i = 0
    var conv = 0L
    var turn = 0
    while (i < nTurns) {
      val len = Transcripts.convLen(conv, 42L)
      if (turn >= len) { conv += 1; turn = 0 }
      else {
        texts(i) = Transcripts.makeTurn(conv, turn, 42L)._1.text
        turn += 1; i += 1
      }
    }
    val alias = Transcripts.aliasRows
    val trie = Trie(alias.map(_.surface))
    val dict = alias.map(r => r.surface -> r.label).toMap
    val tagger = new LexiconCrfTagger(trie, dict, Transcripts.tagSet)
    val C = Transcripts.tagSet.length

    def time(name: String)(f: => Long): Unit = {
      var k = 0
      while (k < 4) { // rep 0 = warmup
        val t0 = System.nanoTime()
        val acc = f
        val sec = (System.nanoTime() - t0) / 1e9
        if (k > 0) println(f"[probe] $name%-12s $sec%7.3f s  ${nTurns / sec}%,.0f turns/s  acc=$acc")
        k += 1
      }
    }

    // (a) bare trie walk, counting matches (mirrors decodeInto's inline walk)
    time("walk") {
      var acc = 0L
      var j = 0
      while (j < nTurns) {
        val text = texts(j)
        val n = text.length
        var i = 0
        while (i < n) {
          var ptr = trie.root
          var k = 0
          var continue = true
          while (continue && k < n - i) {
            if (k > trie.maxDepth) continue = false
            else {
              ptr = ptr.child(text.charAt(i + k))
              if (ptr == null) continue = false
              else { if (k >= trie.minLen && ptr.isWord) acc += 1; k += 1 }
            }
          }
          i += 1
        }
        j += 1
      }
      acc
    }

    // (b) emission fill alone (alloc-free scratch reuse)
    val em = new Array[Float](4096 * C)
    time("fill") {
      var acc = 0L
      var j = 0
      while (j < nTurns) {
        val n = texts(j).length
        java.util.Arrays.fill(em, 0, n * C, 0f)
        var i = 0
        while (i < n) { em(i * C) = 0.1f; i += 1 }
        acc += n
        j += 1
      }
      acc
    }

    // (c) full spanOne
    time("spanOne") {
      var acc = 0L
      var j = 0
      while (j < nTurns) { acc += tagger.spanOne(texts(j)).size; j += 1 }
      acc
    }
  }
}
