package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic shuffle / split / sample (SURVEY §2.2 "random shuffle /
  * random split / sampling" rows).
  *
  * The reference draws from a global RNG (`tools/set_seed.py:6-13` +
  * `random.shuffle` in the loaders), whose output depends on iteration
  * order — meaningless on a distributed table. These operators key every
  * draw on a CONTENT hash (xxhash64 of the key columns mixed with the
  * seed), so membership and order are reproducible on any partitioning,
  * any parallelism, and any task retry — the property a 100 TB pipeline
  * actually needs (stable split membership across reruns; documented
  * deviation, same class as Augment's seeded replacement draws).
  *
  * `rand(seed)`/`randomSplit` are NOT used: their per-partition RNG streams
  * change results whenever the row→partition assignment changes.
  */
object Sampling {

  private def keyHash(keys: Seq[String], seed: Long) =
    xxhash64((keys.map(col) :+ lit(seed)): _*)

  /** uniform [0,1) draw per row, derived from the content hash. */
  private def unit(keys: Seq[String], seed: Long) =
    pmod(keyHash(keys, seed), lit(1000000L)).cast("double") / 1000000.0

  /** Deterministic "random" shuffle: global order by hash(keys, seed),
    * ties broken by the keys themselves (total order ⇒ stable output).
    */
  def seededShuffle(df: DataFrame, keys: Seq[String], seed: Long = 42L): DataFrame =
    df.orderBy((keyHash(keys, seed) +: keys.map(col)): _*)

  /** Deterministic split into `weights.length` disjoint, exhaustive parts
    * with expected proportions `weights` (normalized; need not sum to 1).
    */
  def seededSplit(df: DataFrame, keys: Seq[String], weights: Seq[Double],
                  seed: Long = 42L): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be positive")
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _ / total)
    val u = unit(keys, seed)
    cum.sliding(2).toSeq.zipWithIndex.map { case (Seq(lo, hi), i) =>
      // last bucket closes the interval so u is always assigned exactly once
      if (i == weights.length - 1) df.filter(u >= lo)
      else df.filter(u >= lo && u < hi)
    }
  }

  /** Deterministic ~`fraction` sample keyed on content hash. */
  def seededSample(df: DataFrame, keys: Seq[String], fraction: Double,
                   seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(unit(keys, seed) < fraction)
  }
}
