package graft

/** Driver-contract smoke: `SparkEntry.entry` must return rows (the driver
  * checks exactly this), and every registered query must have aligned
  * oracle coverage metadata.
  */
class EntrySpec extends SparkSpecBase {
  test("entry returns rows on the flagship pipeline") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("all queries run at sf0.001; non-empty except the 7 legitimately-empty-at-tiny-sf") {
    // pair/anti-join queries CAN be empty at sf0.001 (too few docs for any
    // near-dup pair to clear its threshold) — every other query must return
    // rows. Keep this list in sync deliberately: adding a query here mutes
    // its non-empty gate.
    val expectedEmptyOk = Set("q05_customers_without_orders", "q32_except_seen",
      "q14_unigram_jaccard_pairs", "q19_cosine_neardup", "q16b_simhash_pairs",
      "q15_minhash_pairs", "q31_overlap_check")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, "/root/testdata/sf0.001").count()
        if (n == 0 && !expectedEmptyOk(name)) Some(s"$name: 0 rows") else None
      } catch { // String.valueOf: a message-less exception must not NPE the reporter
        case e: Throwable => Some(s"$name: ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
