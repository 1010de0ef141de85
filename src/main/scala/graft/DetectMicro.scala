package graft

import graft.core._
import graft.stages.LexiconCrfTagger
import graft.synth.Transcripts

/** Single-threaded micro-benchmark of the detect hot core (`spanOne`):
  * isolates tagger CPU cost (trie walk + emission fill + Viterbi) from
  * Spark's row plumbing, so per-optimization deltas are measurable without
  * 32-core scheduler noise. Usage: `runMain graft.DetectMicro [nTurns]`.
  *
  * Prints per-rep wall, turns/s, and a span-count checksum (must stay
  * constant across optimizations — any drift is a correctness bug).
  */
object DetectMicro {
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

    def rep(): (Double, Long) = {
      val t0 = System.nanoTime()
      var spans = 0L
      var j = 0
      while (j < nTurns) { spans += tagger.spanOne(texts(j)).size; j += 1 }
      ((System.nanoTime() - t0) / 1e9, spans)
    }
    rep() // warmup (JIT)
    var k = 0
    while (k < 3) {
      val (sec, spans) = rep()
      println(f"[micro] rep$k $sec%7.3f s  ${nTurns / sec}%,.0f turns/s  spans=$spans")
      k += 1
    }
  }
}
