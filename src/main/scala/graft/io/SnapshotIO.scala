package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped snapshot layer over partitioned Parquet (SURVEY.md §7.1:
  * no Iceberg jars on the classpath, so the table-format *semantics* the
  * north_rule needs — content-addressed snapshots, atomic-ish commit,
  * per-stage lineage counters, idempotent resume — are provided by a
  * manifest convention):
  *
  *   <base>/<stage>/snapshot=<inputHash>/          ← parquet data
  *   <base>/<stage>/snapshot=<inputHash>/_manifest.json
  *
  * Commit protocol: data is written to a `_tmp_` directory and atomically
  * renamed into place, the manifest written last — a crashed run leaves
  * either no snapshot or a `_tmp_` orphan, never a half-committed snapshot
  * that resume would trust (mirrors the reference's etag-keyed pickle cache,
  * `CC/loaders/utils/cache_manager.py:7-45` + `reader.py:31-51`, with
  * content hash in place of S3 etag).
  */
object SnapshotIO {

  def snapshotDir(base: String, stage: String, inputHash: String): Path =
    Paths.get(base, stage, s"snapshot=$inputHash")

  def isCommitted(base: String, stage: String, inputHash: String): Boolean =
    Files.exists(snapshotDir(base, stage, inputHash).resolve("_manifest.json"))

  /** Run `compute` unless a committed snapshot for `inputHash` already
    * exists; either way return the snapshot-backed DataFrame. `counters`
    * are evaluated only on compute, AFTER the snapshot write (so
    * accumulator-backed counters carry the write action's totals — they
    * land in the manifest for lineage).
    *
    * Concurrency contract: one writer per (base, stage, inputHash). Each
    * attempt writes to its OWN uuid-suffixed `_tmp_` dir (two racing
    * writers can no longer interleave rows in a shared tmp), and losing
    * the final rename race is treated as "committed by the other writer" —
    * but a concurrent orphan SWEEP can still delete a peer's in-flight tmp,
    * which fails that peer loudly (never corrupts the committed snapshot).
    */
  def resumeOrCompute(spark: SparkSession, base: String, stage: String,
                      inputHash: String,
                      counters: => Map[String, Long] = Map.empty)
                     (compute: => DataFrame): DataFrame = {
    val dir = snapshotDir(base, stage, inputHash)
    if (!isCommitted(base, stage, inputHash)) {
      // sweep crash orphans from previous attempts (any uuid)
      sweepTmp(dir)
      val tmp = dir.getParent.resolve(
        s"_tmp_${dir.getFileName}_${java.util.UUID.randomUUID().toString.take(8)}")
      val df = compute
      df.write.mode("overwrite").parquet(tmp.toString)
      // per-FILE lineage counters over the snapshot as STORED (north_rule:
      // every stage writes per-partition counters). input_file_name groups
      // by the durable written file — immune to read-time split packing
      // (maxPartitionBytes bin-packing / large-file splitting), which made
      // spark_partition_id() of the read-back reflect reader config, not
      // the stage's stored layout.
      import org.apache.spark.sql.functions.{col, count, input_file_name, lit, regexp_extract}
      val partCounts = spark.read.parquet(tmp.toString)
        .groupBy(regexp_extract(input_file_name(), "part-(\\d+)", 1)
          .cast("int").as("partition_id"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("stage", lit(stage))
        .withColumn("snapshot", lit(inputHash))
        .select(col("stage"), col("snapshot"), col("partition_id"), col("rows"))
        .cache()
      val rows = partCounts.agg(org.apache.spark.sql.functions.sum(col("rows")))
        .head().getLong(0)
      partCounts.coalesce(1).write.mode("overwrite")
        .parquet(Paths.get(base, "_metrics", stage, inputHash).toString)
      partCounts.unpersist()
      deleteRecursively(dir)
      Files.createDirectories(dir.getParent)
      val won =
        try { Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.DirectoryNotEmptyException =>
            deleteRecursively(tmp) // a concurrent writer committed first
            false
        }
      if (won) {
        val counterJson = (counters + ("rows" -> rows))
          .map { case (k, v) => s""""$k":$v""" }.mkString(",")
        val manifest =
          s"""{"stage":"$stage","input_hash":"$inputHash","rows":$rows,
             |"committed_at":"${java.time.Instant.now()}","counters":{$counterJson}}"""
            .stripMargin.replace("\n", "")
        // manifest last = commit point
        Files.write(dir.resolve("_manifest.json"),
          manifest.getBytes(StandardCharsets.UTF_8))
      }
    }
    spark.read.parquet(dir.toString)
  }

  /** Delete every `_tmp_<snapshot dirname>*` orphan beside `dir`. */
  private def sweepTmp(dir: Path): Unit =
    if (Files.exists(dir.getParent)) {
      val prefix = s"_tmp_${dir.getFileName}"
      val ls = Files.list(dir.getParent)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.toSeq
          .filter(_.getFileName.toString.startsWith(prefix))
          .foreach(deleteRecursively)
      } finally ls.close()
    }

  /** All lineage rows recorded under `base` (stage, snapshot, partition_id,
    * rows) — the queryable metrics table.
    */
  def metrics(spark: SparkSession, base: String): DataFrame = {
    val p = Paths.get(base, "_metrics")
    spark.read.parquet(s"$p/*/*") // stage/snapshot are data columns, not dirs
  }

  /** CSV metrics sink — the reference's metric-file shape (header + rows;
    * the analysis CSVs of `CC/analysis.py` / training logs). The parquet
    * lineage table above is the at-scale representation; this sink exists
    * for drop-in compatibility with CSV consumers of the reference.
    */
  def writeMetricsCsv(metrics: DataFrame, path: String): Unit =
    metrics.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p) // stream holds directory handles — must close
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }
}
