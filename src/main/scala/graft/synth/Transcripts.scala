package graft.synth

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core._

/** Deterministic synthetic transcript corpus (FIXTURES.md §1).
  *
  * Every field derives from `splitmix64(seed, convIdx, turnIdx)` — no global
  * RNG — so the corpus is reproducible row-by-row on any partitioning and at
  * any parallelism (the per-turn analogue of the reference's fixed-seed
  * protocol, `tools/set_seed.py:6-13`).
  *
  * Conversation lengths are Zipf-ish skewed (a few hot conversations get
  * ~40× the median turns) to exercise the salted-repartition path the
  * north_rule requires.
  *
  * The generator also emits the gold side-tables: planted mention spans and
  * the triples implied by the fixed assembly rules — these are the
  * "reference oracle" (Scala transliteration of the deterministic ccNERx
  * semantics: trie match → dictionary tags → BMES decode) against which the
  * pipeline's P/R ≥ 0.95 gate is scored.
  */
object Transcripts {

  // ---- deterministic hashing --------------------------------------------
  /** splitmix64 — public-domain mixing function. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def h(parts: Long*): Long = parts.foldLeft(0x5eed5eedL)((a, b) => mix(a ^ b))
  /** non-negative bounded draw */
  def draw(bound: Int, parts: Long*): Int = (((h(parts: _*) >>> 1) % bound).toInt)

  // ---- gazetteer ---------------------------------------------------------
  /** entity_id → surfaces. Deliberately messy: some real-world entities carry
    * TWO entity ids (e.g. ORG0a/ORG0b) reconciled only by `sameAs` edges, so
    * canonicalization genuinely needs connected components.
    */
  val persons: Vector[(String, String)] = Vector(
    "PER00" -> "Alice Varga", "PER01" -> "Bob Castillo", "PER02" -> "Carol Danvers",
    "PER03" -> "Deepak Rao", "PER04" -> "Elena Petrova", "PER05" -> "Frank Mueller",
    "PER06" -> "Grace Obi", "PER07" -> "Hiro Tanaka", "PER08" -> "Ivy Chen",
    "PER09" -> "Jack Monroe", "PER10" -> "Karin Solberg", "PER11" -> "Luis Ortega")

  /** (entity_id, surface); alias surfaces of the same org may map to a
    * sibling id — see `sameAs`.
    */
  val orgs: Vector[(String, String)] = Vector(
    "ORG00a" -> "Acme Corp", "ORG00b" -> "Acme Corporation",
    "ORG01a" -> "Globex Industries", "ORG01b" -> "Globex",
    "ORG02a" -> "Initech Systems", "ORG02b" -> "Initech",
    "ORG03a" -> "Umbrella Labs", "ORG04a" -> "Stark Analytics",
    "ORG05a" -> "Wayne Logistics", "ORG06a" -> "Hooli Cloud",
    "ORG07a" -> "Vandelay Imports")

  val locations: Vector[(String, String)] = Vector(
    "LOC00" -> "Berlin", "LOC01" -> "Osaka", "LOC02" -> "Toronto",
    "LOC03" -> "Nairobi", "LOC04" -> "Montevideo", "LOC05" -> "Oslo",
    "LOC06" -> "Lisbon", "LOC07" -> "Auckland")

  /** same-entity evidence pairs (the CC input besides identity). */
  val sameAs: Vector[(String, String)] = Vector(
    "ORG00a" -> "ORG00b", "ORG01a" -> "ORG01b", "ORG02a" -> "ORG02b")

  /** canonical id = min over the connected component (canonical-ID election). */
  val canonicalOf: Map[String, String] = {
    val base = (persons ++ orgs ++ locations).map { case (id, _) => id -> id }.toMap
    sameAs.foldLeft(base) { case (m, (a, b)) =>
      val c = Seq(m(a), m(b)).min
      m.map { case (k, v) => if (v == m(a) || v == m(b)) k -> c else k -> v }
    }
  }

  def aliasRows: Seq[AliasRow] =
    persons.map { case (id, s) => AliasRow(s, id, "PER") } ++
      orgs.map { case (id, s) => AliasRow(s, id, "ORG") } ++
      locations.map { case (id, s) => AliasRow(s, id, "LOC") }

  val tagSet: Vector[String] =
    "O" +: (for (p <- Vector("B", "I", "E", "S"); t <- Vector("PER", "ORG", "LOC")) yield s"$p-$t")

  // ---- templates ---------------------------------------------------------
  // Slots: P=person, G=org, L=location. Text around slots is entity-free.
  private val templates: Vector[(String, Vector[Char])] = Vector(
    ("please summarize the sync between % and % for the weekly report", Vector('P', 'P')),
    ("% just joined % as a staff engineer", Vector('P', 'G')),
    ("% opened a new office in % last quarter", Vector('G', 'L')),
    ("the contract between % and % was signed in %", Vector('G', 'G', 'L')),
    ("% flew to % to meet % on site", Vector('P', 'L', 'P')),
    ("reminder: % presents the roadmap tomorrow", Vector('P')),
    ("no entities here, just chatter about shuffle partitions and codegen", Vector()),
    ("% filed the quarterly numbers for %", Vector('P', 'G')),
    ("tool returned the registry entry for % based in %", Vector('G', 'L')),
    ("% and % debated the migration plan with %", Vector('P', 'P', 'P')))

  val roles = Vector("user", "assistant", "tool")
  val tools = Vector(null, "search", "crm_lookup", "calendar")
  private val baseTs = 1704067200000L // 2024-01-01T00:00:00Z

  /** conversation length: skewed — every 97th conversation is hot. */
  def convLen(convIdx: Long, seed: Long): Int = {
    val base = 3 + draw(8, seed, convIdx, 11L)
    if (convIdx % 97 == 0) base * 40 else base
  }

  final case class GoldMention(conv_id: String, turn_idx: Int, start: Int,
                               end: Int, label: String, surface: String,
                               entity_id: String)

  /** Build one turn + its gold mentions, purely from (seed, convIdx, turnIdx). */
  def makeTurn(convIdx: Long, turnIdx: Int, seed: Long): (Turn, List[GoldMention]) = {
    val convId = f"conv_$convIdx%08d"
    val (tpl, slots) = templates(draw(templates.length, seed, convIdx, turnIdx, 1L))
    val sb = new StringBuilder
    var golds = List.empty[GoldMention]
    var slotI = 0
    var pos = 0
    var last = 0
    while ({ pos = tpl.indexOf('%', last); pos >= 0 }) {
      sb.append(tpl.substring(last, pos))
      val (id, surface, label) = slots(slotI) match {
        case 'P' => val (i, s) = persons(draw(persons.length, seed, convIdx, turnIdx, 2L + slotI)); (i, s, "PER")
        case 'G' => val (i, s) = orgs(draw(orgs.length, seed, convIdx, turnIdx, 2L + slotI)); (i, s, "ORG")
        case 'L' => val (i, s) = locations(draw(locations.length, seed, convIdx, turnIdx, 2L + slotI)); (i, s, "LOC")
      }
      val start = sb.length
      sb.append(surface)
      golds ::= GoldMention(convId, turnIdx, start, start + surface.length, label, surface, id)
      slotI += 1
      last = pos + 1
    }
    sb.append(tpl.substring(last))
    // salts 101/102: DISJOINT from the slot-entity salt space (2L + slotI).
    // The old salts 3L/4L collided with slots 1/2 — `draw` hashes only
    // (seed, conv, turn, salt), so the role shared its hash with the 2nd
    // slot's entity draw and, 3 dividing 12, role == personIdx % 3 — a
    // deterministic correlation between fields documented as independent.
    val role = roles(draw(roles.length, seed, convIdx, turnIdx, 101L))
    val tool = if (role == "tool") tools(1 + draw(tools.length - 1, seed, convIdx, turnIdx, 102L)) else null
    val ts = new Timestamp(baseTs + convIdx * 3600000L + turnIdx * 30000L)
    (Turn(convId, turnIdx, role, sb.result(), tool, ts), golds.reverse)
  }

  // ---- datasets ----------------------------------------------------------
  /** Distributed generation: one task range over conversations; ~`nConvs`
    * conversations of skewed length. At 10^12-turn scale this becomes a read
    * of the Iceberg transcripts table; the generator stands in for it with
    * identical schema and ordering guarantees.
    */
  def turns(spark: SparkSession, nConvs: Long, seed: Long = 42L,
            partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, parts).flatMap { convIdx =>
      (0 until convLen(convIdx, seed)).iterator.map(t => makeTurn(convIdx, t, seed)._1)
    }
  }

  def goldMentions(spark: SparkSession, nConvs: Long, seed: Long = 42L): Dataset[GoldMention] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, parts).flatMap { convIdx =>
      (0 until convLen(convIdx, seed)).iterator.flatMap(t => makeTurn(convIdx, t, seed)._2)
    }
  }

  /** Gold triples under the fixed assembly rules (§ stages.Triples):
    * within one turn, over canonical ids:
    *   PER×ORG → affiliated_with, PER×PER (ordered pairs, i<j) → mentions_with,
    *   ORG×LOC → located_in;
    * across adjacent turns of one conversation (window k=1):
    *   PER(t) × PER(t-1), distinct canon ids → follows_up.
    * Distinct over (subj,pred,obj,conv_id,turn_idx).
    */
  def goldTriples(spark: SparkSession, nConvs: Long, seed: Long = 42L): Dataset[Triple] = {
    import spark.implicits._
    val parts = spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, parts).flatMap { convIdx =>
      val n = convLen(convIdx, seed)
      val perTurn = (0 until n).map(t => makeTurn(convIdx, t, seed)._2)
      (0 until n).iterator.flatMap { t =>
        val ms = perTurn(t).map(g => (canonicalOf(g.entity_id), g.label))
        val convId = f"conv_$convIdx%08d"
        val within =
          (for ((p, _) <- ms.filter(_._2 == "PER"); (o, _) <- ms.filter(_._2 == "ORG"))
            yield Triple(p, "affiliated_with", o, convId, t)) ++
          (for (i <- ms.indices; j <- ms.indices; if i < j;
                if ms(i)._2 == "PER" && ms(j)._2 == "PER" && ms(i)._1 != ms(j)._1)
            yield Triple(ms(i)._1, "mentions_with", ms(j)._1, convId, t)) ++
          (for ((g, _) <- ms.filter(_._2 == "ORG"); (l, _) <- ms.filter(_._2 == "LOC"))
            yield Triple(g, "located_in", l, convId, t))
        val cross = if (t == 0) Nil else {
          val prev = perTurn(t - 1).filter(_.label == "PER").map(g => canonicalOf(g.entity_id))
          for (p <- ms.filter(_._2 == "PER").map(_._1); q <- prev; if p != q)
            yield Triple(p, "follows_up", q, convId, t)
        }
        (within ++ cross).iterator
      }
    }.distinct()
  }
}
