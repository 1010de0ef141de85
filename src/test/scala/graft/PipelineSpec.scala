package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.stages._
import graft.synth.Transcripts

/** End-to-end KG pipeline against the generator's gold tables — the
  * BASELINE.json gate: triple and mention P/R ≥ 0.95 (here exactly 1.0 by
  * construction: deterministic tagger over a deterministic corpus), plus
  * per-turn text-equality and resume-idempotence invariants.
  */
class PipelineSpec extends SparkSpecBase {
  private val N = 120L // conversations (includes hot conv 0 and 97)

  private var cachedResult: Option[Pipeline.Result] = None
  lazy val result: Pipeline.Result = {
    val r = Pipeline.run(spark, N)
    r.mentions.cache(); r.triples.cache()
    cachedResult = Some(r)
    r
  }

  override def afterAll(): Unit = {
    // the session is shared across suites — release this suite's cached
    // blocks so later memory-hungry suites aren't eating into storage memory
    cachedResult.foreach { r => r.mentions.unpersist(); r.triples.unpersist() }
    super.afterAll()
  }

  test("mention P/R vs gold ≥ 0.95 (target: = 1.0)") {
    val gold = Transcripts.goldMentions(spark, N).toDF()
    val prf = Eval.prf(result.mentions, gold, Eval.spanKeys)
    assert(prf.nGold > 0)
    assert(prf.precision == 1.0, s"precision ${prf.precision}")
    assert(prf.recall == 1.0, s"recall ${prf.recall}")
  }

  test("mention surfaces are exact text slices (per-turn text equality)") {
    import spark.implicits._
    val turns = Transcripts.turns(spark, N)
    val joined = result.mentions.join(turns.toDF(), Seq("conv_id", "turn_idx"))
      .withColumn("slice", expr("substring(text, start + 1, end - start)"))
    assert(joined.filter(col("slice") =!= col("surface")).count() == 0)
  }

  test("all mentions link exactly (complete dictionary)") {
    assert(result.linked.filter(col("entity_id").isNull).count() == 0)
    assert(result.linked.filter(col("method") =!= "exact").count() == 0)
  }

  test("triple P/R vs gold ≥ 0.95 (target: = 1.0)") {
    val gold = Transcripts.goldTriples(spark, N).toDF()
    val prf = Eval.prf(result.triples, gold, Eval.tripleKeys)
    assert(prf.nGold > 0, "gold triples empty")
    assert(prf.precision == 1.0, s"precision ${prf.precision} (${prf.nPred} pred vs ${prf.nGold} gold)")
    assert(prf.recall == 1.0, s"recall ${prf.recall} (${prf.nMatch} matched of ${prf.nGold})")
  }

  test("window / join-based / auto-routed triple assembly are exactly equivalent") {
    import spark.implicits._
    val canon = result.canon.as[graft.core.CanonMention]
    def sorted(t: org.apache.spark.sql.Dataset[Triple]) =
      t.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    val viaWindow = sorted(Triples.runWindow(canon))
    assert(sorted(Triples.runJoinBased(canon)) == viaWindow)
    // default chunked path (every conversation fits one chunk)
    assert(sorted(Triples.run(canon)) == viaWindow)
    // chunk size small enough that every conversation spans many chunks —
    // boundary context stitching must reproduce every cross-turn triple
    assert(sorted(Triples.run(canon, chunkTurns = 3)) == viaWindow)
    assert(sorted(Triples.run(canon, chunkTurns = 2)) == viaWindow)
    // dictionary-encoded hot path (the Pipeline default since round 4)
    assert(sorted(Triples.runEncoded(canon, Pipeline.transcriptsDict)) == viaWindow)
    assert(sorted(Triples.runEncoded(canon, Pipeline.transcriptsDict, chunkTurns = 3)) == viaWindow)
    // + numeric conv codec (exchange carries a long conv key, decode inverts)
    assert(sorted(Triples.runEncoded(canon, Pipeline.transcriptsDict,
      convCodec = Some(Pipeline.transcriptsConvCodec))) == viaWindow)
    assert(sorted(Triples.runEncoded(canon, Pipeline.transcriptsDict, chunkTurns = 3,
      convCodec = Some(Pipeline.transcriptsConvCodec))) == viaWindow)
    // prePack=false (the A/B control: round-4 one-row-per-mention exchange)
    assert(sorted(Triples.runEncoded(canon, Pipeline.transcriptsDict,
      prePack = false)) == viaWindow)
    assert(sorted(Triples.runEncoded(canon, Pipeline.transcriptsDict, chunkTurns = 3,
      convCodec = Some(Pipeline.transcriptsConvCodec), prePack = false)) == viaWindow)
    // sorted-exchange walker (no collect_list/window; lag from the partition
    // sort) — small chunks force cross-chunk context through the walker's
    // derived-ctx path
    assert(sorted(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict)) == viaWindow)
    assert(sorted(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
      chunkTurns = 3)) == viaWindow)
    assert(sorted(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
      chunkTurns = 2)) == viaWindow)
    assert(sorted(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
      convCodec = Some(Pipeline.transcriptsConvCodec))) == viaWindow)
    assert(sorted(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
      chunkTurns = 3, convCodec = Some(Pipeline.transcriptsConvCodec))) == viaWindow)
  }

  test("sorted exchange: 64-bit codec, 32-bit packed and hashed-key layouts are equivalent") {
    import spark.implicits._
    val canon = result.canon.as[graft.core.CanonMention]
    def sorted(t: org.apache.spark.sql.Dataset[Triple]) =
      t.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    val viaWindow = sorted(Triples.runWindow(canon))
    // fits32=false forces the 3-column 64-bit key layout (the Pipeline codec
    // is fits32=true, so the default-path tests above cover Packed32; this
    // keeps the 64-bit walker covered too)
    val codec64 = Pipeline.transcriptsConvCodec.copy(fits32 = false)
    for (chunk <- Seq(Triples.DefaultChunkTurns, 3, 2)) {
      assert(sorted(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
        chunkTurns = chunk, convCodec = Some(codec64))) == viaWindow,
        s"codec64 chunkTurns=$chunk diverged")
      // the hashed path treats ANY string id as opaque — numeric ones too
      assert(sorted(Triples.runEncodedSortedHashed(canon, Pipeline.transcriptsDict,
        chunkTurns = chunk)) == viaWindow, s"hashed chunkTurns=$chunk diverged")
    }
  }

  test("hashed sorted exchange: UUID-keyed corpus, natural and adversarial layouts") {
    import spark.implicits._
    // deterministic UUID-shaped remap of every conv id (md5 hex 8-4-4-4-12):
    // NOT numeric-derivable, so no ConvCodec can serve it — the exact shape
    // runEncodedSortedHashed exists for
    val uuid = expr("concat(substr(md5(conv_id),1,8),'-',substr(md5(conv_id),9,4)," +
      "'-',substr(md5(conv_id),13,4),'-',substr(md5(conv_id),17,4),'-'," +
      "substr(md5(conv_id),21,12))")
    val canon = result.canon.withColumn("conv_id", uuid).as[graft.core.CanonMention]
    def sorted(t: org.apache.spark.sql.Dataset[Triple]) =
      t.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    val viaWindow = sorted(Triples.runWindow(canon))
    assert(viaWindow.nonEmpty)
    for (chunk <- Seq(Triples.DefaultChunkTurns, 3, 2))
      assert(sorted(Triples.runEncodedSortedHashed(canon, Pipeline.transcriptsDict,
        chunkTurns = chunk)) == viaWindow, s"uuid hashed chunkTurns=$chunk diverged")
    // adversarial map-side layout: round-robin repartition destroys the
    // turn-contiguous run structure markCarriers amortizes on — carriers
    // multiply and turns can sort before their group's first carrier,
    // exercising the walker's pending-turn buffering; output must not move
    val shuffled = canon.repartition(7).as[graft.core.CanonMention]
    assert(sorted(Triples.runEncodedSortedHashed(shuffled, Pipeline.transcriptsDict,
      chunkTurns = 3)) == viaWindow, "adversarial layout diverged")
  }

  test("fused detect→packed path ≡ detect→link→canon→sorted chain (round-7 hot path)") {
    import spark.implicits._
    def sorted(t: org.apache.spark.sql.Dataset[Triple]) =
      t.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    val canon = result.canon.as[graft.core.CanonMention]
    val viaChain = sorted(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
      convCodec = Some(Pipeline.transcriptsConvCodec)))
    assert(viaChain.nonEmpty)
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    // small chunk sizes force cross-chunk context through the fused path's
    // own overlap duplication (computed in the JVM, not in Catalyst)
    for (chunk <- Seq(Triples.DefaultChunkTurns, 3, 2))
      assert(sorted(Triples.runFusedDetect(result.turns, tagger,
        Transcripts.aliasRows, Transcripts.sameAs, Pipeline.transcriptsDict,
        Pipeline.transcriptsConvEncodeJvm, Pipeline.transcriptsConvCodec.decode,
        chunkTurns = chunk)) == viaChain, s"fused chunkTurns=$chunk diverged")
    // Result.triples IS the fused path since round 7 — pin the wiring too
    assert(sorted(result.triples.as[Triple]) == viaChain)
  }

  test("fused linked/canon relations ≡ staged Link.run/Canon.run (round-7 Result wiring)") {
    import spark.implicits._
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    val stagedLinked = Link.run(
      Detect.run(result.turns, tagger), Transcripts.aliasRows.toDF(),
      enableFuzzy = false)
    def lk(d: org.apache.spark.sql.Dataset[LinkedMention]) =
      d.collect().toSeq.sortBy(m => (m.conv_id, m.turn_idx, m.start, m.label))
    val fusedLinked = Link.runFusedDetect(result.turns, tagger, Transcripts.aliasRows)
    assert(lk(fusedLinked) == lk(stagedLinked))
    assert(lk(result.linked.as[LinkedMention]) == lk(stagedLinked))
    val stagedCanon = Canon.run(stagedLinked, Transcripts.sameAs.toDF("src", "dst"))
    def ck(d: org.apache.spark.sql.Dataset[CanonMention]) =
      d.collect().toSeq.sortBy(m => (m.conv_id, m.turn_idx, m.start, m.label))
    assert(ck(Canon.runFusedLinked(stagedLinked, Transcripts.sameAs)) == ck(stagedCanon))
    assert(ck(result.canon.as[CanonMention]) == ck(stagedCanon))
    // NIL propagation: an unlinkable mention keeps null entity AND canonical
    val nil = Seq(LinkedMention("c", 0, 0, 3, "PER", "nope", null, null)).toDS()
    val c = Canon.runFusedLinked(nil, Transcripts.sameAs).collect()
    assert(c.head.entity_id == null && c.head.canonical_id == null)
  }

  test("JVM conv encode ≡ Column conv encode on boundary ids (fused-path codec mirror)") {
    import spark.implicits._
    val ids = Seq(
      // accepts: exactly 8 digits (any leading zeros), 9–18 digits without
      "conv_00000000", "conv_00000042", "conv_99999999", "conv_100000000",
      "conv_4294967296", "conv_999999999999999999",
      // rejects: short, 9-digit leading zero, non-digit, bad prefix, empty
      // tail, 19 digits (beyond the rlike range)
      "conv_0000000", "conv_012345678", "conv_1234567x", "x_00000000",
      "conv_", "conv_1234567890123456789")
    val colEnc = ids.toDF("id")
      .select(Pipeline.transcriptsConvCodec.encode(col("id")).cast("long").as("e"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    val jvmEnc = ids.map(s =>
      try Some(Pipeline.transcriptsConvEncodeJvm(s))
      catch { case _: IllegalStateException => None })
    assert(colEnc == jvmEnc, s"col=$colEnc jvm=$jvmEnc")
  }

  test("fused path keeps the loud guards: bad conv id, fits32, chunk overflow") {
    import spark.implicits._
    val tagger = Detect.lexiconTagger(spark, Transcripts.aliasRows, Transcripts.tagSet)
    def fused(turns: org.apache.spark.sql.Dataset[Turn], chunk: Int = Triples.DefaultChunkTurns) =
      Triples.runFusedDetect(turns, tagger, Transcripts.aliasRows,
        Transcripts.sameAs, Pipeline.transcriptsDict,
        Pipeline.transcriptsConvEncodeJvm, Pipeline.transcriptsConvCodec.decode,
        chunkTurns = chunk)
    val text = "Alice Varga just joined Acme Corp as a staff engineer"
    val bad = Seq(Turn("not_numeric", 0, "user", text, null,
      new java.sql.Timestamp(0L))).toDS()
    val e1 = intercept[Exception] { fused(bad).collect() }
    assert(msgs(e1).exists(_.contains("convCodec failed")), s"got: ${msgs(e1)}")
    val big = Seq(Turn("conv_4294967296", 0, "user", text, null,
      new java.sql.Timestamp(0L))).toDS()
    val e2 = intercept[Exception] { fused(big).collect() }
    assert(msgs(e2).exists(_.contains("fits32 violated")), s"got: ${msgs(e2)}")
    val deep = Seq(Turn(f"conv_${7}%08d", 3 * 32768 - 1, "user", text, null,
      new java.sql.Timestamp(0L))).toDS()
    val e3 = intercept[Exception] { fused(deep, chunk = 3).collect() }
    assert(msgs(e3).exists(_.contains("turn_idx ≥ chunkTurns")), s"got: ${msgs(e3)}")
    // an all-NIL turn guards nothing (packedMentions' post-filter semantics):
    // the SAME corrupt conv id with no dictionary mention must pass silently
    val nilOnly = Seq(Turn("not_numeric", 0, "user",
      "no entities here, just chatter", null, new java.sql.Timestamp(0L))).toDS()
    assert(fused(nilOnly).collect().isEmpty)
  }

  test("TripleDict entity gate fails LOUDLY past MaxEntities (driver-memory bound)") {
    val e = intercept[IllegalArgumentException] {
      TripleDict(Seq("PER"), (0 until 10).map(i => s"E$i"), maxEntities = 4)
    }
    assert(e.getMessage.contains("use Triples.run"), e.getMessage)
    // at the bound: fine
    assert(TripleDict(Seq("PER"), (0 until 4).map(i => s"E$i"), maxEntities = 4)
      .entities.length == 4)
    assert(TripleDict.MaxEntities == 50000000)
  }

  test("k=2 rule set through the sorted walker: lag ring ≡ local reference on all layouts") {
    import spark.implicits._
    // sparse handcrafted corpus: turn gaps make lag POSITION ≠ turn distance,
    // the trap a depth-2 rule must survive (ring lookup is by absolute turn)
    val rnd = new scala.util.Random(123)
    val labels = Array("PER", "ORG", "LOC")
    val rows = (0 until 6).flatMap { c =>
      (0 until 25).flatMap { t =>
        if (rnd.nextInt(3) == 0) Nil
        else (0 until 1 + rnd.nextInt(2)).map { m =>
          val lbl = labels(rnd.nextInt(3))
          CanonMention(f"conv_$c%08d", t, m * 10, m * 10 + 3, lbl, "x",
            s"$lbl$m", s"$lbl$m")
        }
      }
    }
    val canon = rows.toDS()
    val dict = TripleDict(labels.toSeq, rows.map(_.canonical_id))
    val perB = dict.rankOfLabel("PER")
    // default k=1 rules PLUS PER(t)×PER(t−2), distinct ids → follows_up2
    val rules2 = new Triples.PackedRules {
      val depth = 2
      private val inner = Triples.defaultRules(dict)
      def emit(ms: Array[Long], msLen: Int, ring: Triples.LagRing,
               convId: String, turnIdx: Int, ents: IndexedSeq[String],
               dedup: Triples.PairDedup,
               out: scala.collection.mutable.ArrayBuffer[Triple]): Unit = {
        inner.emit(ms, msLen, ring, convId, turnIdx, ents, dedup, out)
        val prev = ring.msAt(turnIdx - 2); val prevLen = ring.lenAt(turnIdx - 2)
        val seen = scala.collection.mutable.Set.empty[(Int, Int)]
        var i = 0
        while (i < msLen) {
          if (((ms(i) >>> 32) & 0xff).toInt == perB) {
            var j = 0
            while (j < prevLen) {
              if (((prev(j) >>> 32) & 0xff).toInt == perB) {
                val s = (ms(i) & 0xffffffffL).toInt
                val o = (prev(j) & 0xffffffffL).toInt
                if (s != o && seen.add((s, o)))
                  out += Triple(ents(s), "follows_up2", ents(o), convId, turnIdx)
              }
              j += 1
            }
          }
          i += 1
        }
      }
    }
    // local reference: base k=1 triples from the trusted window witness,
    // plus follows_up2 computed directly from the fixture rows
    val byTurn = rows.groupBy(r => (r.conv_id, r.turn_idx))
    val fu2 = byTurn.keys.toSeq.flatMap { case (cid, t) =>
      val cur = byTurn((cid, t)).filter(_.label == "PER").map(_.canonical_id)
      val prev = byTurn.getOrElse((cid, t - 2), Nil).filter(_.label == "PER")
        .map(_.canonical_id)
      (for (p <- cur; q <- prev; if p != q) yield Triple(p, "follows_up2", q, cid, t))
        .distinct
    }
    assert(fu2.nonEmpty, "fixture must exercise depth-2 context")
    val expect = (Triples.runWindow(canon).collect().toSeq ++ fu2)
      .sortBy(t => (t.conv_id, t.turn_idx, t.subj, t.pred, t.obj))
    def got(t: org.apache.spark.sql.Dataset[Triple]) =
      t.collect().toSeq.sortBy(t => (t.conv_id, t.turn_idx, t.subj, t.pred, t.obj))
    val codec32 = Pipeline.transcriptsConvCodec
    val codec64 = codec32.copy(fits32 = false)
    for (chunk <- Seq(Triples.DefaultChunkTurns, 7, 4, 3)) {
      assert(got(Triples.runEncodedSortedRules(canon, dict, chunk,
        Some(codec32), rules2)) == expect, s"packed32 k=2 chunkTurns=$chunk")
      assert(got(Triples.runEncodedSortedRules(canon, dict, chunk,
        Some(codec64), rules2)) == expect, s"codec64 k=2 chunkTurns=$chunk")
      assert(got(Triples.runEncodedSortedRules(canon, dict, chunk,
        None, rules2)) == expect, s"string-key k=2 chunkTurns=$chunk")
      assert(got(Triples.runEncodedSortedHashedRules(canon, dict, chunk,
        rules2)) == expect, s"hashed k=2 chunkTurns=$chunk")
    }
  }

  /** All messages down a Spark-nested cause chain (raise_error wraps). */
  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("conv codec fails LOUDLY on an id its encoder cannot parse") {
    import spark.implicits._
    val canon = Seq(
      CanonMention("not_numeric", 0, 0, 3, "PER", "x", "PER00", "PER00")).toDS()
    val e = intercept[Exception] {
      Triples.runEncoded(canon, Pipeline.transcriptsDict,
        convCodec = Some(Pipeline.transcriptsConvCodec)).collect()
    }
    assert(msgs(e).exists(_.contains("convCodec failed")), s"got: ${msgs(e)}")
  }

  test("fits32 codec fails LOUDLY on a conv key ≥ 2^32 (would alias another conversation)") {
    import spark.implicits._
    // conv_4294967296 parses (10 digits, no leading zero) but exceeds 32
    // bits — the Packed32 layout must abort, never truncate into a
    // different conversation's key space
    val canon = Seq(
      CanonMention("conv_4294967296", 0, 0, 3, "PER", "x", "PER00", "PER00")).toDS()
    val e = intercept[Exception] {
      Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
        convCodec = Some(Pipeline.transcriptsConvCodec)).collect()
    }
    assert(msgs(e).exists(_.contains("fits32 violated")), s"got: ${msgs(e)}")
    // the SAME corpus is served fine by the 64-bit layout
    val ok = Triples.runEncodedSorted(canon, Pipeline.transcriptsDict,
      convCodec = Some(Pipeline.transcriptsConvCodec.copy(fits32 = false))).collect()
    assert(ok.isEmpty) // one lone PER mention emits no triples — but it ran
  }

  test("packed layouts fail LOUDLY when turn_idx overflows the chunk field") {
    import spark.implicits._
    // chunk occupies 15 bits in the Packed32/Hashed layouts: with a tiny
    // chunk size, a turn index past chunkTurns·2^15 must abort, not wrap
    val canon = Seq(
      CanonMention(f"conv_${7}%08d", 3 * 32768, 0, 3, "PER", "x", "PER00", "PER00")).toDS()
    val e1 = intercept[Exception] {
      Triples.runEncodedSorted(canon, Pipeline.transcriptsDict, chunkTurns = 3,
        convCodec = Some(Pipeline.transcriptsConvCodec)).collect()
    }
    assert(msgs(e1).exists(_.contains("turn_idx ≥ chunkTurns")), s"got: ${msgs(e1)}")
    val e2 = intercept[Exception] {
      Triples.runEncodedSortedHashed(canon, Pipeline.transcriptsDict,
        chunkTurns = 3).collect()
    }
    assert(msgs(e2).exists(_.contains("turn_idx ≥ chunkTurns")), s"got: ${msgs(e2)}")
    // regression: the OVERLAP COPY's chunk+1 must also fit 15 bits — turn
    // chunkTurns·2^15 − k sits in the last chunk's overlap window, whose
    // copy would compute chunk 2^15 and carry into the conv-key bits,
    // leaking a phantom negative-turn context row into the NEXT key's
    // chunk 0 (the original guard admitted it)
    val boundary = Seq(
      CanonMention(f"conv_${7}%08d", 3 * 32768 - 1, 0, 3, "PER", "x",
        "PER00", "PER00")).toDS()
    val e3 = intercept[Exception] {
      Triples.runEncodedSorted(boundary, Pipeline.transcriptsDict, chunkTurns = 3,
        convCodec = Some(Pipeline.transcriptsConvCodec)).collect()
    }
    assert(msgs(e3).exists(_.contains("turn_idx ≥ chunkTurns")), s"got: ${msgs(e3)}")
    val e4 = intercept[Exception] {
      Triples.runEncodedSortedHashed(boundary, Pipeline.transcriptsDict,
        chunkTurns = 3).collect()
    }
    assert(msgs(e4).exists(_.contains("turn_idx ≥ chunkTurns")), s"got: ${msgs(e4)}")
    // the 64-bit and string layouts carry the same turn fine (32-bit chunk)
    assert(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict, chunkTurns = 3,
      convCodec = Some(Pipeline.transcriptsConvCodec.copy(fits32 = false)))
      .collect().isEmpty)
    assert(Triples.runEncodedSorted(canon, Pipeline.transcriptsDict, chunkTurns = 3,
      convCodec = None).collect().isEmpty)
  }

  test("encoded path fails LOUDLY on a canonical_id missing from the dict") {
    import spark.implicits._
    val canon = Seq(
      CanonMention("c1", 0, 0, 3, "PER", "x", "PER00", "PER00"),
      CanonMention("c1", 0, 5, 8, "PER", "x", "ZZZ99", "ZZZ99")).toDS()
    val dict = TripleDict(Seq("PER"), Seq("PER00"))
    val e = intercept[Exception] {
      Triples.runEncoded(canon, dict).collect()
    }
    assert(msgs(e).exists(_.contains("canonical_id not in dict")), s"got: ${msgs(e)}")
  }

  test("encoded path fails LOUDLY on a negative mention start (corrupt upstream row)") {
    import spark.implicits._
    // a negative start would otherwise pack into the long's high bits and
    // silently corrupt sort order + dedup — must hit the raise_error guard
    val canon = Seq(
      CanonMention("c1", 0, -1, 3, "PER", "x", "PER00", "PER00")).toDS()
    val dict = TripleDict(Seq("PER"), Seq("PER00"))
    val e = intercept[Exception] { Triples.runEncoded(canon, dict).collect() }
    assert(msgs(e).exists(_.contains("start outside")), s"got: ${msgs(e)}")
  }

  test("encoded path fails LOUDLY on a negative turn_idx (corrupt upstream row)") {
    import spark.implicits._
    // the sorted exchange packs (chunk, turn) into one long whose order is
    // (chunk asc, turn asc) only for non-negative turns — a corrupt negative
    // index must abort, not silently mis-sort the conversation
    val canon = Seq(
      CanonMention("c1", -3, 0, 3, "PER", "x", "PER00", "PER00")).toDS()
    val dict = TripleDict(Seq("PER"), Seq("PER00"))
    val e = intercept[Exception] {
      Triples.runEncodedSorted(canon, dict).collect()
    }
    assert(msgs(e).exists(_.contains("negative turn_idx")), s"got: ${msgs(e)}")
  }

  test("property: chunked ≡ window ≡ join on random sparse corpora × random chunk sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(1337)
    val labels = Array("PER", "ORG", "LOC")
    for (trial <- 1 to 4) {
      val nConvs = 1 + rnd.nextInt(6)
      val canon = (0 until nConvs).flatMap { c =>
        val nTurns = 1 + rnd.nextInt(40)
        (0 until nTurns).flatMap { t =>
          // ~1/3 of turns empty → exercises non-adjacent prev filtering
          if (rnd.nextInt(3) == 0) Nil
          else (0 until 1 + rnd.nextInt(3)).map { m =>
            val lbl = labels(rnd.nextInt(3))
            CanonMention(f"conv_$c%08d", t, m * 10, m * 10 + 3, lbl, "x",
              s"$lbl${rnd.nextInt(5)}", s"$lbl${rnd.nextInt(5)}")
          }
        }
      }.toDS()
      def sorted(t: org.apache.spark.sql.Dataset[Triple]) =
        t.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
      val viaWindow = sorted(Triples.runWindow(canon))
      val chunk = Seq(2, 3, 5, 17)(rnd.nextInt(4))
      assert(sorted(Triples.run(canon, chunkTurns = chunk)) == viaWindow,
        s"trial $trial chunkTurns=$chunk diverged")
      assert(sorted(Triples.runJoinBased(canon)) == viaWindow, s"trial $trial join diverged")
      // encoded path: dict covers every id the random generator can emit
      val dict = TripleDict(labels.toSeq,
        for (l <- labels.toSeq; i <- 0 until 5) yield s"$l$i")
      assert(sorted(Triples.runEncoded(canon, dict, chunkTurns = chunk)) == viaWindow,
        s"trial $trial encoded chunkTurns=$chunk diverged")
      // sorted walker: roll a random wire layout each trial (string /
      // packed32 / codec64 / hashed) so every layout sees random corpora
      val sortedGot = rnd.nextInt(4) match {
        case 0 => Triples.runEncodedSorted(canon, dict, chunkTurns = chunk)
        case 1 => Triples.runEncodedSorted(canon, dict, chunkTurns = chunk,
          convCodec = Some(Pipeline.transcriptsConvCodec)) // fits32 → Packed32
        case 2 => Triples.runEncodedSorted(canon, dict, chunkTurns = chunk,
          convCodec = Some(Pipeline.transcriptsConvCodec.copy(fits32 = false)))
        case 3 => Triples.runEncodedSortedHashed(canon, dict, chunkTurns = chunk)
      }
      assert(sorted(sortedGot) == viaWindow,
        s"trial $trial sorted-exchange chunkTurns=$chunk diverged")
    }
  }

  test("generalized chunk overlap k=2: boundary context ≡ unchunked window for depth-2 rules") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{DataFrame, Row}
    val rnd = new scala.util.Random(77)
    val labels = Array("PER", "ORG", "LOC")
    val canon = (0 until 4).flatMap { c =>
      (0 until 30).flatMap { t =>
        if (rnd.nextInt(3) == 0) Nil // sparse: gaps exercise idx-vs-lag checks
        else (0 until 1 + rnd.nextInt(2)).map { m =>
          val lbl = labels(rnd.nextInt(3))
          CanonMention(s"conv$c", t, m * 10, m * 10 + 3, lbl, "x", s"$lbl$m", s"$lbl$m")
        }
      }
    }.toDS()
    val packed = canon.toDF()
      .select(col("conv_id").as("_cid"), col("turn_idx"),
        struct(col("start"), col("label"), col("canonical_id")).as("_m"))
    val agg = sort_array(collect_list(col("_m")))

    def msOf(r: Row, i: Int): Seq[(Int, String, String)] =
      r.getSeq[Row](i).map(x => (x.getInt(0), x.getString(1), x.getString(2)))
    // depth-d context (d ∈ 1..2): the (d, prev-turn ms) pairs whose lag's
    // ACTUAL turn distance is d — the idx check every depth-d rule makes
    // (lag position ≠ turn distance on sparse turn indices)
    def ctx(df: DataFrame): Map[(String, Int), Set[(Int, Seq[(Int, String, String)])]] =
      df.collect().map { r =>
        val t = r.getInt(1)
        val pairs = Seq(3, 5).flatMap { c =>
          if (r.isNullAt(c)) Nil
          else {
            val d = t - r.getInt(c)
            if (d <= 2) Seq((d, msOf(r, c + 1))) else Nil
          }
        }.toSet
        (r.getString(0), t) -> pairs
      }.toMap

    val perTurn = packed.groupBy(col("_cid"), col("turn_idx")).agg(agg.as("ms"))
    val w = Window.partitionBy(col("_cid")).orderBy(col("turn_idx"))
    val unchunked = perTurn
      .withColumn("i1", lag(col("turn_idx"), 1).over(w))
      .withColumn("m1", lag(col("ms"), 1).over(w))
      .withColumn("i2", lag(col("turn_idx"), 2).over(w))
      .withColumn("m2", lag(col("ms"), 2).over(w))
      .select(col("_cid"), col("turn_idx"), col("ms"),
        col("i1"), col("m1"), col("i2"), col("m2"))
    val expect = ctx(unchunked)
    assert(expect.exists(_._2.exists(_._1 == 2)), "fixture must exercise depth-2 context")
    for (chunk <- Seq(3, 4, 7)) {
      val got = ctx(Triples.chunkedWithContext(packed, chunk, 2, agg))
      assert(got == expect, s"chunkTurns=$chunk depth-2 context diverged")
    }
  }

  test("a pathological oversized conversation spreads across chunks and matches the window") {
    import spark.implicits._
    // one conversation 100× over the chunk size, mixed with normal ones —
    // the shape that serializes a single window task at web scale; sparse
    // turns (every 3rd empty) exercise the non-adjacent-prev filtering at
    // chunk boundaries too
    val huge = (0 until 5000).filter(_ % 3 != 2).map(i =>
      CanonMention("huge", i, 0, 5, "PER", "x", s"P${i % 7}", s"P${i % 7}"))
    val normal = (0 until 60).map(i =>
      CanonMention(s"c${i / 3}", i % 3, 0, 5, "PER", "x", s"Q$i", s"Q$i"))
    val canon = (huge ++ normal).toDS()
    def sorted(t: org.apache.spark.sql.Dataset[Triple]) =
      t.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    val chunked = sorted(Triples.run(canon, chunkTurns = 50))
    assert(chunked == sorted(Triples.runWindow(canon)))
    assert(chunked.exists(_.conv_id == "huge") && chunked.exists(_.conv_id == "c0"))
    val dict = TripleDict(Seq("PER"),
      (0 until 7).map(i => s"P$i") ++ (0 until 60).map(i => s"Q$i"))
    assert(sorted(Triples.runEncoded(canon, dict, chunkTurns = 50)) == chunked)
    assert(sorted(Triples.runEncodedSorted(canon, dict, chunkTurns = 50)) == chunked)
  }

  test("canonicalization resolves sibling org ids to component min") {
    val canon = result.canon
    val acme = canon.filter(col("entity_id").isin("ORG00a", "ORG00b"))
      .select("canonical_id").distinct().collect().map(_.getString(0))
    assert(acme.toSeq == Seq("ORG00a"))
  }

  test("turn ordering is dense and unique per conversation") {
    import spark.implicits._
    val turns = Transcripts.turns(spark, N).toDF()
    val bad = turns.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("turn_idx")).as("d"),
        max(col("turn_idx")).as("mx"))
      .filter(col("n") =!= col("d") || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("hot conversations exist (skew fixture)") {
    import spark.implicits._
    val sizes = Transcripts.turns(spark, N).groupBy("conv_id").count()
    val mx = sizes.agg(max("count")).head().getLong(0)
    val med = sizes.agg(expr("percentile_approx(count, 0.5)")).head().getLong(0)
    assert(mx >= med * 10, s"expected skew, max=$mx median=$med")
  }
}

class ResumeSpec extends SparkSpecBase {
  test("snapshot resume is idempotent and byte-stable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val t1 = Pipeline.runWithSnapshots(spark, 30, dir)
    val rows1 = t1.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    // second run: every stage must resume from committed snapshots
    val t2 = Pipeline.runWithSnapshots(spark, 30, dir)
    val rows2 = t2.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    assert(rows1 == rows2)
    // simulate crash-after-stage-2: delete downstream snapshots, rerun
    graft.io.SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir, "canon"))
    graft.io.SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir, "triples"))
    val t3 = Pipeline.runWithSnapshots(spark, 30, dir)
    val rows3 = t3.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    assert(rows1 == rows3)
    // crash-mid-write simulation: a _tmp_ orphan (no manifest) must NOT be
    // trusted by resume — stage recomputes and commits atomically over it
    val mentionsDir = java.nio.file.Paths.get(dir, "mentions")
    graft.io.SnapshotIO.deleteRecursively(
      java.nio.file.Paths.get(dir, "mentions", "snapshot=n30_s42"))
    java.nio.file.Files.createDirectories(
      mentionsDir.resolve("_tmp_snapshot=n30_s42"))
    java.nio.file.Files.writeString(
      mentionsDir.resolve("_tmp_snapshot=n30_s42").resolve("junk.parquet"), "garbage")
    graft.io.SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir, "canon"))
    graft.io.SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir, "triples"))
    val t4 = Pipeline.runWithSnapshots(spark, 30, dir)
    val rows4 = t4.orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    assert(rows1 == rows4)
    graft.io.SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("manifest-pointer commit (object-store protocol): resume matrix without any rename") {
    import graft.io.SnapshotIO
    val dir = java.nio.file.Files.createTempDirectory("graft_snapmp").toString
    def run() = Pipeline
      .runWithSnapshots(spark, 30, dir, protocol = SnapshotIO.ManifestPointer)
      .orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    val rows1 = run()
    assert(rows1.nonEmpty)
    // layout: data lives under an immutable data-<uuid> dir named by the
    // manifest; nothing was ever renamed into place
    val snapDir = SnapshotIO.snapshotDir(dir, "triples", "n30_s42")
    val manifest = new String(java.nio.file.Files.readAllBytes(
      snapDir.resolve("_manifest.json")))
    assert(manifest.contains("\"data_dir\":\"data-"), manifest)
    // plain rerun resumes every stage (byte-stable)
    assert(run() == rows1)
    // crash-mid-write: an uncommitted data-<uuid> orphan beside a DELETED
    // manifest must not be trusted — stage recomputes and re-publishes
    java.nio.file.Files.delete(snapDir.resolve("_manifest.json"))
    java.nio.file.Files.createDirectories(snapDir.resolve("data-deadbeef"))
    java.nio.file.Files.writeString(
      snapDir.resolve("data-deadbeef").resolve("junk.parquet"), "garbage")
    assert(run() == rows1)
    // mixed-protocol resume: a workdir committed under ManifestPointer
    // resumes under the default (AtomicRename) entry point too
    val mixed = Pipeline.runWithSnapshots(spark, 30, dir)
      .orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    assert(mixed == rows1)
    SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("an EMPTY stage output commits and resumes under both protocols") {
    import graft.io.SnapshotIO
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val empty = spark.range(0).selectExpr("id", "cast(id as string) as s")
    // the metrics sum over zero lineage rows is null — an unguarded getLong
    // crashed here post-write/pre-commit, wedging the stage forever
    val out1 = SnapshotIO.resumeOrCompute(spark, dir, "stg", "h0")(empty.toDF())
    assert(out1.count() == 0)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      SnapshotIO.snapshotDir(dir, "stg", "h0").resolve("_manifest.json")))
    assert(manifest.contains("\"rows\":0"), manifest)
    var computed = false
    val out2 = SnapshotIO.resumeOrCompute(spark, dir, "stg", "h0") {
      computed = true; empty.toDF()
    }
    assert(out2.count() == 0 && !computed, "resume must not recompute")
    val out3 = SnapshotIO.resumeOrCompute(spark, dir, "stg2", "h0",
      protocol = SnapshotIO.ManifestPointer)(empty.toDF())
    assert(out3.count() == 0)
    SnapshotIO.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("orphan sweep: TTL-aged orphans reclaimed, deep-fresh writers kept") {
    import graft.io.SnapshotIO
    import java.nio.file.{Files, Path, Paths}
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_sweep").toString
    def run() = Pipeline
      .runWithSnapshots(spark, 30, dir, protocol = SnapshotIO.ManifestPointer)
      .orderBy("conv_id", "turn_idx", "subj", "pred", "obj").collect().toSeq
    val rows1 = run()
    val snapDir = SnapshotIO.snapshotDir(dir, "triples", "n30_s42")
    // two uncommitted data-* orphans beside the committed snapshot, shaped
    // like in-flight parquet writes (churn deep under _temporary):
    //   data-aged — every mtime 2×TTL old → reclaimed on the next entry
    //   data-live — shallow mtimes old, ONE deep part file fresh (the
    //   long-skewed-task signature) → kept: the unbounded liveness walk
    //   must see it
    def mk(name: String): Path = {
      val deep = snapDir.resolve(name).resolve("_temporary").resolve("0")
        .resolve("_temporary").resolve("attempt_0")
      Files.createDirectories(deep)
      Files.writeString(deep.resolve("part-00000"), "x")
      snapDir.resolve(name)
    }
    val old = FileTime.fromMillis(
      System.currentTimeMillis() - 2 * SnapshotIO.OrphanTtlMs)
    def ageAll(p: Path): Unit = { // after creation: creating children bumps parents
      val walk = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.foreach(q => Files.setLastModifiedTime(q, old))
      } finally walk.close()
    }
    val aged = mk("data-aged"); ageAll(aged)
    val live = mk("data-live"); ageAll(live)
    Files.setLastModifiedTime( // deep touch only — parents stay old
      live.resolve("_temporary").resolve("0").resolve("_temporary")
        .resolve("attempt_0").resolve("part-00000"),
      FileTime.fromMillis(System.currentTimeMillis()))
    assert(run() == rows1) // the entry sweep runs with both orphans present
    assert(!Files.exists(aged), "TTL-aged orphan must be swept")
    assert(Files.exists(live), "deep-fresh orphan must read as a live writer")
    SnapshotIO.deleteRecursively(Paths.get(dir))
  }

  test("writer lock: two racing writers serialize; the loser resumes the winner's commit") {
    import graft.io.SnapshotIO
    import java.nio.file.{Files, Paths}
    import java.util.concurrent.atomic.AtomicInteger
    // the single-writer contract is now ENFORCED: the second entrant must
    // block on the lock, never run compute, and NEVER disturb the winner's
    // committed snapshot (the ADVICE-r4 cross-protocol race: an
    // AtomicRename writer's deleteRecursively vs a ManifestPointer writer's
    // in-flight data-* dir — impossible once both hold the same lock)
    for ((pA, pB) <- Seq(
        (SnapshotIO.AtomicRename, SnapshotIO.AtomicRename),
        (SnapshotIO.ManifestPointer, SnapshotIO.AtomicRename),
        (SnapshotIO.AtomicRename, SnapshotIO.ManifestPointer))) {
      val dir = Files.createTempDirectory("graft_lock").toString
      val computes = new AtomicInteger(0)
      def enter(protocol: SnapshotIO.CommitProtocol, delayMs: Long) =
        SnapshotIO.resumeOrCompute(spark, dir, "stg", "h0", protocol = protocol) {
          computes.incrementAndGet()
          Thread.sleep(delayMs) // hold the lock long enough for B to collide
          spark.range(100).selectExpr("id", "cast(id as string) as s").toDF()
        }.selectExpr("sum(id)").head().getLong(0)
      @volatile var bResult = -1L
      @volatile var bErr: Throwable = null
      val a = new Thread(() => enter(pA, 1500L))
      val b = new Thread(() => {
        // enter only once A demonstrably holds the lock (or already won) —
        // a fixed sleep would race the scheduler, not the protocol
        val lock = SnapshotIO.lockPath(SnapshotIO.snapshotDir(dir, "stg", "h0"))
        while (!Files.exists(lock) && !SnapshotIO.isCommitted(dir, "stg", "h0"))
          Thread.sleep(10)
        try bResult = enter(pB, 0L)
        catch { case t: Throwable => bErr = t }
      })
      a.start(); b.start(); a.join(60000); b.join(60000)
      assert(bErr == null, s"loser failed spuriously under ($pA,$pB): $bErr")
      assert(computes.get() == 1,
        s"exactly one writer must compute under ($pA,$pB), got ${computes.get()}")
      assert(bResult == 4950L, s"loser must serve the winner's rows under ($pA,$pB)")
      // the winner's snapshot survived both exits, is committed, readable,
      // and the lock was released
      assert(SnapshotIO.isCommitted(dir, "stg", "h0"))
      val reread = SnapshotIO.resumeOrCompute(spark, dir, "stg", "h0") {
        fail("post-race resume must not recompute")
      }
      assert(reread.count() == 100)
      assert(!Files.exists(SnapshotIO.lockPath(
        SnapshotIO.snapshotDir(dir, "stg", "h0"))), "lock must be released")
      SnapshotIO.deleteRecursively(Paths.get(dir))
    }
  }

  test("writer lock: a dead holder's TTL-aged lock is stolen, a recompute proceeds") {
    import graft.io.SnapshotIO
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val dir = Files.createTempDirectory("graft_stale").toString
    val lock = SnapshotIO.lockPath(SnapshotIO.snapshotDir(dir, "stg", "h0"))
    Files.createDirectories(lock.getParent)
    Files.writeString(lock, """{"holder":"dead-jvm"}""")
    // a LIVE holder heartbeats at TTL/4, so 2×TTL-old can only mean a crash
    Files.setLastModifiedTime(lock,
      FileTime.fromMillis(System.currentTimeMillis() - 2 * SnapshotIO.OrphanTtlMs))
    val out = SnapshotIO.resumeOrCompute(spark, dir, "stg", "h0") {
      spark.range(7).toDF()
    }
    assert(out.count() == 7, "stale lock must be stolen, not waited on")
    assert(SnapshotIO.isCommitted(dir, "stg", "h0"))
    assert(!Files.exists(lock), "stolen lock must be released after commit")
    SnapshotIO.deleteRecursively(Paths.get(dir))
  }

  test("writer lock: release never deletes a lock stolen and re-held by a peer") {
    import graft.io.SnapshotIO
    import java.nio.file.{Files, Paths}
    // The residual wedged-holder scenario: while a writer is inside its
    // body, a peer deems its lock stale, steals it, and CREATE_NEWs a fresh
    // lock at the same path. The original writer's release must then leave
    // that fresh lock alone (holder-id check) — an unconditional delete
    // would let a third writer in beside the live peer. Simulated by
    // swapping the lock's content for a foreign holder's inside compute.
    val dir = Files.createTempDirectory("graft_stolen").toString
    val lock = SnapshotIO.lockPath(SnapshotIO.snapshotDir(dir, "stg", "h0"))
    val out = SnapshotIO.resumeOrCompute(spark, dir, "stg", "h0") {
      Files.delete(lock) // the peer's steal…
      Files.writeString(lock, """{"holder":"peer-jvm"}""") // …and fresh lock
      spark.range(5).toDF()
    }
    assert(out.count() == 5)
    assert(Files.exists(lock), "release must not delete a peer's re-held lock")
    assert(Files.readString(lock).contains("peer-jvm"))
    SnapshotIO.deleteRecursively(Paths.get(dir))
  }
}

class CanonSpec extends SparkSpecBase {
  import graft.stages.Canon

  test("connected components: chains, stars, isolated pairs") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), // chain → comp a
      ("x", "y"),                          // pair → comp x
      ("m", "n"), ("n", "o"), ("m", "o")  // triangle → comp m
    ).toDF("src", "dst")
    val comp = Canon.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("a", "b", "c", "d").forall(comp(_) == "a"))
    assert(Seq("x", "y").forall(comp(_) == "x"))
    assert(Seq("m", "n", "o").forall(comp(_) == "m"))
  }

  test("long path converges (log-round algorithm)") {
    import spark.implicits._
    val n = 64
    val edges = (0 until n).map(i => (f"v$i%03d", f"v${i + 1}%03d")).toDF("src", "dst")
    val comp = Canon.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp.values.toSet == Set("v000"))
    assert(comp.size == n + 1)
  }

  test("512-edge chain: rounds stay within the log bound, convergence reported") {
    import spark.implicits._
    // the adversarial shape CCBench runs at 10M edges — pinned small here so
    // a regression in the star loop's round complexity fails the suite
    // (maxLocalEdges = 0 forces the DISTRIBUTED loop past the fast path)
    val n = 512
    val edges = (0 until n).map(i => (f"v$i%04d", f"v${i + 1}%04d")).toDF("src", "dst")
    val (comp, rounds, converged) =
      Canon.connectedComponentsWithStats(edges, maxLocalEdges = 0)
    assert(converged, "chain must converge before maxIter")
    assert(rounds >= 1 && rounds <= 12,
      s"log-round bound violated (or fast path taken): $rounds rounds for a $n-chain")
    val m = comp.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.size == n + 1 && m.values.toSet == Set("v0000"))
  }

  test("driver fast path ≡ distributed star loop on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val nV = 30 + rnd.nextInt(50)
      val edges = (0 until 80).map { _ =>
        (s"n${rnd.nextInt(nV)}", s"n${rnd.nextInt(nV)}")
      }.toDF("src", "dst")
      def sortedComp(maxLocal: Long) =
        Canon.connectedComponents(edges, maxLocalEdges = maxLocal)
          .orderBy("id").collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val fast = sortedComp(Long.MaxValue)
      val loop = sortedComp(0)
      assert(fast == loop, s"trial $trial: fast path diverged from star loop")
    }
  }
}

class LinkSpec extends SparkSpecBase {
  test("fuzzy LSH linking catches near-miss surfaces") {
    import spark.implicits._
    val mentions = Seq(
      Mention("c1", 0, 0, 9, "ORG", "Acme Corp"),     // exact hit
      Mention("c1", 1, 0, 10, "ORG", "Acme  Corp."),  // fuzzy: extra space + dot
      Mention("c1", 2, 0, 7, "ORG", "Zzzzzzz")        // NIL
    ).toDS()
    val alias = Transcripts.aliasRows.toDF()
    val linked = Link.run(mentions, alias, enableFuzzy = true).collect()
    val byTurn = linked.map(l => l.turn_idx -> l).toMap
    assert(byTurn(0).method == "exact" && byTurn(0).entity_id == "ORG00a")
    assert(byTurn(1).method == "fuzzy" && byTurn(1).entity_id == "ORG00a")
    assert(byTurn(2).entity_id == null)
  }

  test("fuzzy pass preserves same-span mentions with different labels (mention identity incl. label)") {
    import spark.implicits._
    // identical span, two labels; ORG fuzzy-recovers, PER has no candidate —
    // a span-only rerank/anti-join would silently drop one of them
    val mentions = Seq(
      Mention("c1", 0, 0, 10, "ORG", "Acme  Corp."),
      Mention("c1", 0, 0, 10, "PER", "Acme  Corp.")).toDS()
    val out = Link.run(mentions, Transcripts.aliasRows.toDF(), enableFuzzy = true).collect()
    assert(out.length == 2, s"mention lost: ${out.toSeq}")
    val byLabel = out.map(l => l.label -> l).toMap
    assert(byLabel("ORG").method == "fuzzy" && byLabel("ORG").entity_id == "ORG00a")
    assert(byLabel("PER").entity_id == null)
  }

  test("ambiguous dictionary: exact path emits ONE row per mention, min(entity_id) wins") {
    import spark.implicits._
    val mentions = Seq(Mention("c1", 0, 0, 6, "ORG", "Globex")).toDS()
    // two candidate ids for the same (surface, label) — the sibling-id shape
    val alias = Seq(
      AliasRow("Globex", "ORG01b", "ORG"),
      AliasRow("Globex", "ORG01a", "ORG")).toDF()
    val linked = Link.run(mentions, alias).collect()
    assert(linked.length == 1, s"duplicated mention rows: ${linked.toSeq}")
    assert(linked.head.entity_id == "ORG01a" && linked.head.method == "exact")
  }

  test("word→multi-label join carries up to K sorted labels (mlabel_le_loader.py:199-213)") {
    import spark.implicits._
    val words = Seq("spark", "window", "batch").toDF("word")
    val dict = SparkEntry.multiLabelDict.toDF("word", "label")
    val got = Link.multiLabelJoin(words, dict, k = 2).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("spark") == Seq("ENGINE", "TECH"))
    assert(got("window") == Seq("SQL", "TIME")) // 3 labels sliced to K=2
    assert(got("batch") == Seq())               // dictionary miss → empty array
  }

  test("default Link.run is exact-only (no fuzzy jobs on the hot path)") {
    import spark.implicits._
    val mentions = Seq(Mention("c1", 0, 0, 7, "ORG", "Zzzzzzz")).toDS()
    val linked = Link.run(mentions, Transcripts.aliasRows.toDF()).collect()
    assert(linked.length == 1 && linked.head.entity_id == null && linked.head.method == null)
  }

  test("fuzzy pass with ZERO misses: no driver gate, runtime-collapsed empty join") {
    import spark.implicits._
    // every mention links exactly — the miss side is empty at RUNTIME, which
    // since round 6 is handled by AQE empty-relation propagation instead of
    // a driver-side count() gating the plan (VERDICT r5 item 6)
    val mentions = Seq(
      Mention("c1", 0, 0, 9, "ORG", "Acme Corp"),
      Mention("c2", 3, 5, 11, "LOC", "Berlin")).toDS()
    val out = Link.run(mentions, Transcripts.aliasRows.toDF(), enableFuzzy = true).collect()
    assert(out.length == 2 && out.forall(_.method == "exact"))
    assert(out.map(_.entity_id).toSet == Set("ORG00a", "LOC00"))
  }
}
