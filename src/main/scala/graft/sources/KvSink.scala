package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal DataSourceV2 BATCH WRITE connector — the other half of the
  * [[SeqSource]] handshake: a (key BIGINT, val STRING) line sink with
  * the full V2 commit protocol, staged for ATOMIC publish:
  *
  *  - every task writes into a write-scoped `.staging-<writeId>/`
  *    directory and reports a [[KvCommit]] message — nothing under the
  *    table root changes while tasks run;
  *  - the DRIVER's `commit()` moves the staged files into the root,
  *    writes the snapshot's immutable `manifest-v%06d` log entry, then
  *    atomically REPLACES the `_SUCCESS` latest pointer (temp file +
  *    ATOMIC_MOVE) — the single commit point. An overwrite
  *    (`mode("overwrite")` → TRUNCATE capability) RETAINS the
  *    previously-manifested files: they drop out of the latest
  *    manifest but stay readable through the version log (TIME TRAVEL,
  *    [[KvSink.committedPaths(path:String,version:Long)*]]) until
  *    [[KvSink.vacuum]] reclaims them — the Iceberg/Delta
  *    snapshot-swap + retention rhythm on a filesystem;
  *  - `abort()` deletes the staging directory; orphaned task files are
  *    invisible because readers go through [[KvSink.committedFiles]],
  *    never through directory listing.
  *
  * The local-filesystem paths stand in for distributed storage: at
  * scale the same five interfaces write s3a/HDFS task-attempt paths and
  * the manifest becomes the snapshot commit.
  */
class KvSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType().add("key", LongType).add("val", StringType)
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"))
}

object KvSink {
  /** The manifest-gated read path: the files published by the last
    * committed write, with their committed row counts. Uncommitted task
    * files, in-flight staging directories and post-crash orphans are
    * invisible — readers see exactly one committed snapshot.
    */
  def committedFiles(path: String): Seq[(String, Long)] = {
    val manifest = Paths.get(path, "_SUCCESS")
    if (!Files.exists(manifest)) Seq.empty
    else parseManifest(manifest)
  }

  /** Time travel: the snapshot as of a HISTORICAL version. Every commit
    * also writes an immutable `manifest-v%06d` alongside the `_SUCCESS`
    * latest pointer (the Delta/Iceberg snapshot-log shape), and
    * TRUNCATE no longer physically deletes the superseded snapshot's
    * files — they stay on disk, invisible to the latest manifest,
    * readable through any retained historical one until [[vacuum]]
    * reclaims them.
    */
  def committedFiles(path: String, version: Long): Seq[(String, Long)] = {
    val manifest = Paths.get(path, f"manifest-v$version%06d")
    if (!Files.exists(manifest)) Seq.empty
    else parseManifest(manifest)
  }

  /** Committed version numbers, ascending. */
  def versions(path: String): Seq[Long] = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) Seq.empty
    else {
      val listing = Files.list(dir)
      try listing.toArray.toSeq.map(_.asInstanceOf[Path])
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("manifest-v") =>
          n.stripPrefix("manifest-v").toLong
        }.sorted
      finally listing.close()
    }
  }

  /** Absolute paths of the committed snapshot — what a reader scans. */
  def committedPaths(path: String): Seq[String] =
    committedFiles(path).map { case (f, _) => Paths.get(path, f).toString }

  /** Absolute paths of a historical snapshot. */
  def committedPaths(path: String, version: Long): Seq[String] =
    committedFiles(path, version).map { case (f, _) =>
      Paths.get(path, f).toString
    }

  /** Retention GC (the Delta VACUUM shape): keep the newest
    * `keepLatest` version manifests, delete every part file referenced
    * ONLY by older versions, then drop the expired manifests. The
    * current `_SUCCESS` snapshot is always retained regardless of
    * `keepLatest`. Returns the deleted file names (part files +
    * manifests) for audit.
    */
  def vacuum(path: String, keepLatest: Int): Seq[String] = {
    val vs = versions(path)
    val (expired, kept) = vs.splitAt(math.max(0, vs.length - math.max(1, keepLatest)))
    val live: Set[String] =
      (kept.flatMap(v => committedFiles(path, v)) ++ committedFiles(path))
        .map(_._1).toSet
    val doomedParts = expired.flatMap(v => committedFiles(path, v))
      .map(_._1).distinct.filterNot(live)
    val doomedManifests = expired.map(v => f"manifest-v$v%06d")
    (doomedParts ++ doomedManifests).map { f =>
      Files.deleteIfExists(Paths.get(path, f)); f
    }
  }

  /** Compaction (the Delta OPTIMIZE / Iceberg rewrite_data_files shape):
    * rewrite the CURRENT snapshot's files into `bins` bin-packed outputs
    * and publish the result as a NEW version through the normal
    * truncate-commit — a pure metadata+layout operation with a
    * no-data-change guarantee (AS OF the pre- and post-optimize versions
    * read the same row multiset; the spec pins hash-identity and the
    * dropped file count). The superseded small files stay reachable
    * through the version log until [[vacuum]] — compaction never
    * destroys time travel.
    *
    * `cluster = true` additionally range-clusters rows by key
    * (repartitionByRange + sortWithinPartitions), so compacted files
    * cover DISJOINT key ranges — the layout that lets a range-pruned
    * reader skip whole files, which is the point of OPTIMIZE ... ZORDER
    * at scale (one clustering dimension here; [[graft.ops.ExtraOps]]'s
    * x_zorder is the 2-D generalization of the same idea).
    *
    * Runs as a SPARK JOB over the committed snapshot (read manifest
    * paths → shuffle/coalesce → V2 sink commit), not driver-side IO —
    * exactly how a 100 TB table compacts: the driver only plans bins
    * and swaps manifests.
    */
  def optimize(s: org.apache.spark.sql.SparkSession, path: String,
      bins: Int, cluster: Boolean = false): Long = {
    val files = committedPaths(path)
    require(files.nonEmpty, s"nothing committed at $path")
    val df = s.read.schema("key LONG, val STRING").csv(files: _*)
    val packed =
      if (cluster)
        df.repartitionByRange(bins, org.apache.spark.sql.functions.col("key"))
          .sortWithinPartitions("key")
      else df.coalesce(bins)
    packed.write.format("graft.sources.KvSink").mode("overwrite")
      .option("path", path).save()
    versions(path).last
  }

  /** Diagnostic counter: number of commit-time CAS collisions that were
    * resolved by rebase-and-retry (observability for the concurrency
    * spec and for production metrics — a hot table shows up here).
    */
  val casRetries = new java.util.concurrent.atomic.AtomicLong(0L)

  // ---- WRITE-AUDIT-PUBLISH branches (the Iceberg WAP / Delta shallow
  // branch shape). A write with `.option("branch", name)` commits into a
  // BRANCH-LOCAL version log (`manifest-<name>-v%06d`) whose entries
  // list only the branch's own files: main readers (`_SUCCESS` / the
  // main log) never see them. An audit job reads main ∪ branch, runs its
  // QC gates, and then either [[publish]]es (fast-forward: one CAS'd
  // main-log append naming the already-landed files — a metadata-only
  // O(1) operation, no data is rewritten) or [[dropBranch]]es (the
  // staged files are reclaimed; main never changed). This is the
  // pattern that makes bad data UNPUBLISHABLE rather than merely
  // detectable-after-the-fact.

  /** Committed version numbers of a branch, ascending. */
  def branchVersions(path: String, branch: String): Seq[Long] = {
    val dir = Paths.get(path)
    val prefix = s"branch-$branch-v"
    if (!Files.exists(dir)) Seq.empty
    else {
      val listing = Files.list(dir)
      try listing.toArray.toSeq.map(_.asInstanceOf[Path])
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith(prefix) =>
          n.stripPrefix(prefix).toLong
        }.sorted
      finally listing.close()
    }
  }

  /** The branch's staged files (latest branch snapshot) — what an audit
    * job reads IN ADDITION to the main snapshot before deciding.
    */
  def branchFiles(path: String, branch: String): Seq[(String, Long)] =
    branchVersions(path, branch).lastOption match {
      case None => Seq.empty
      case Some(v) =>
        parseManifest(Paths.get(path, f"branch-$branch-v$v%06d"))
    }

  /** Absolute paths of the branch's staged files. */
  def branchPaths(path: String, branch: String): Seq[String] =
    branchFiles(path, branch).map { case (f, _) =>
      Paths.get(path, f).toString
    }

  /** PUBLISH (fast-forward): append the audited branch's files to the
    * main snapshot as one new CAS'd version — metadata-only, O(manifest)
    * regardless of data volume, linearized through the same
    * create-exclusive version log as every other commit (a concurrent
    * append simply makes the publish rebase and retry). The branch log
    * is consumed. Returns the published main version.
    *
    * IDEMPOTENT and serialized (r14 advice): a crash after the main-log
    * CAS but before the branch-log cleanup leaves the branch
    * re-publishable — the retry skips staged files the latest main
    * manifest already references instead of appending them twice
    * (duplicate rows). The whole operation holds [[pointerLock]] so a
    * concurrent [[dropBranch]] of the same branch cannot delete part
    * files between this publish's staged-files read and its CAS.
    */
  def publish(path: String, branch: String): Long = pointerLock.synchronized {
    val staged = branchFiles(path, branch)
    require(staged.nonEmpty, s"branch $branch of $path has nothing to publish")
    val dir = Paths.get(path)
    var committedV = -1L
    var attempt = 0
    // Committed manifests are IMMUTABLE once their version number is
    // claimed, so each version's file set is read at most once across the
    // whole retry loop — a retry only incorporates versions that appeared
    // since (r15 advice: the previous form re-read every manifest on every
    // CAS attempt, O(versions × files) per retry on a hot table).
    val fileSetByVersion =
      collection.mutable.Map.empty[Long, Seq[(String, Long)]]
    def filesOf(v: Long): Seq[(String, Long)] =
      fileSetByVersion.getOrElseUpdate(v, committedFiles(path, v))
    while (committedV < 0) {
      val vs = versions(path)
      val curV = vs.lastOption.getOrElse(0L)
      val prev = if (curV == 0L) Seq.empty else filesOf(curV)
      // A staged file that appears in ANY committed version was already
      // published once (branch file names are write-id-unique): checking
      // only the latest manifest would let a crash-leftover branch
      // RE-publish after an intervening overwrite truncated main —
      // resurrecting rows the overwrite deliberately removed.
      val everCommitted = vs.flatMap(filesOf).map(_._1).toSet
      val fresh = staged.filterNot { case (f, _) => everCommitted(f) }
      if (fresh.isEmpty) {
        // everything already landed (a retried publish after a crash in
        // the cleanup window) — nothing to append, just finish cleanup
        committedV = curV
      } else {
        val manifest = (prev ++ fresh).map { case (f, n) => s"$f,$n" }
          .mkString("", "\n", "\n")
        val vtmp = dir.resolve(s".publish-$branch-$attempt.tmp")
        Files.write(vtmp, manifest.getBytes(StandardCharsets.UTF_8))
        onBeforeCas()
        try {
          Files.createLink(dir.resolve(f"manifest-v${curV + 1L}%06d"), vtmp)
          committedV = curV + 1L
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            casRetries.incrementAndGet()
            attempt += 1
        } finally Files.deleteIfExists(vtmp)
      }
    }
    {
      val latest = versions(path).last
      val tmp = dir.resolve(s".publish-$branch-success.tmp")
      Files.copy(dir.resolve(f"manifest-v$latest%06d"), tmp,
        StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dir.resolve("_SUCCESS"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    branchVersions(path, branch).foreach { v =>
      Files.deleteIfExists(dir.resolve(f"branch-$branch-v$v%06d"))
    }
    committedV
  }

  /** REJECT: delete the branch log and reclaim its files (unless a main
    * snapshot also references them — never possible for a branch's own
    * write-id-unique files, but checked anyway). Main is untouched; the
    * bad batch never existed as far as any reader is concerned. Returns
    * the reclaimed file names. Serialized on [[pointerLock]] against a
    * concurrent [[publish]] of the same branch (see there).
    */
  def dropBranch(path: String, branch: String): Seq[String] =
    pointerLock.synchronized {
    val dir = Paths.get(path)
    val live: Set[String] =
      (versions(path).flatMap(v => committedFiles(path, v)) ++
        committedFiles(path)).map(_._1).toSet
    val doomedParts = branchVersions(path, branch)
      .flatMap(v => parseManifest(dir.resolve(f"branch-$branch-v$v%06d")))
      .map(_._1).distinct.filterNot(live)
    val doomedManifests =
      branchVersions(path, branch).map(v => f"branch-$branch-v$v%06d")
    (doomedParts ++ doomedManifests).map { f =>
      Files.deleteIfExists(dir.resolve(f)); f
    }
    }

  /** Test/observability hook, invoked between the version read and the
    * CAS attempt of every commit iteration — the window a concurrent
    * committer can win. Lets a spec interleave two writers
    * DETERMINISTICALLY instead of racing threads. No-op in production.
    */
  @volatile private[graft] var onBeforeCas: () => Unit = () => ()

  /** JVM-wide latest-pointer lock. The version log itself is CAS'd on
    * the filesystem (createLink is atomic create-exclusive), but the
    * `_SUCCESS` convenience pointer must be re-derived monotonically —
    * two winners finishing out of order must not regress it. At scale
    * this lock is the catalog's conditional update (Delta's LogStore
    * put-if-absent, Iceberg's atomic swap): pointer publication is the
    * one step a shared catalog serializes, and it is O(1) regardless of
    * table size.
    */
  private[sources] val pointerLock = new Object

  private def parseManifest(manifest: Path): Seq[(String, Long)] =
    new String(Files.readAllBytes(manifest), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf(',')
        (line.substring(0, i), line.substring(i + 1).toLong)
      }

  private[sources] def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}

class KvTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"graft_kv($path)"
  override def schema(): StructType =
    new StructType().add("key", LongType).add("val", StringType)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(path, info.queryId(),
      Option(info.options.get("branch")))
}

class KvWriteBuilder(path: String, writeId: String, branch: Option[String])
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    // The optimistic-concurrency READ POINT: the snapshot version this
    // write was planned against. Commit-time drift from it is how a
    // concurrent committer is detected.
    private val baseVersion = KvSink.versions(path).lastOption.getOrElse(0L)
    override def toBatch: BatchWrite =
      new KvBatchWrite(path, writeId, truncateFirst, baseVersion, branch)
  }
}

case class KvCommit(file: String, rows: Long) extends WriterCommitMessage

class KvBatchWrite(path: String, writeId: String, truncateFirst: Boolean,
    baseVersion: Long, branch: Option[String] = None) extends BatchWrite {
  private val dir = Paths.get(path)
  private val staging = dir.resolve(s".staging-$writeId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    new KvWriterFactory(staging.toString, writeId)
  }

  /** The OPTIMISTIC-CONCURRENCY commit point (two concurrent writers
    * are now first-class). Ordering is the whole story:
    *  1. conflict check: a TRUNCATE planned against a snapshot that is
    *     no longer latest would silently erase the interloper's rows —
    *     it throws ConcurrentModificationException (the Delta
    *     WriteSerializable rule: overwrite conflicts with everything).
    *     An APPEND never conflicts: its files are write-id-unique, so
    *     its file set is provably disjoint from every committed
    *     snapshot and it commutes with any interleaving — the loser
    *     REBASES onto the new latest and retries;
    *  2. staged files move into the root (still invisible — not in the
    *     manifest);
    *  3. the CAS loop: read the latest version V, rebase `published`
    *     on V's snapshot, and attempt to publish `manifest-v(V+1)` via
    *     `Files.createLink` — atomic create-EXCLUSIVE, the filesystem
    *     compare-and-swap (ATOMIC_MOVE is NOT one: POSIX rename
    *     replaces an existing target silently). A concurrent winner
    *     makes the link fail with FileAlreadyExists → re-read, rebase,
    *     retry. The version log is therefore LINEARIZABLE: every
    *     version number is claimed by exactly one commit, and each
    *     manifest extends its immediate predecessor;
    *  4. the `_SUCCESS` latest pointer is re-derived from the true
    *     latest manifest under [[KvSink.pointerLock]] — two winners
    *     finishing out of order cannot regress it.
    * A crash before 4 leaves the old pointer intact and the new version
    * reachable through the log (the next commit's pointer refresh
    * surfaces it); a crash after 4 leaves at most invisible staging
    * leftovers — never a reader-visible partial state. TRUNCATE does
    * NOT physically delete the superseded snapshot's files: they remain
    * reachable through the version log until [[KvSink.vacuum]] reclaims
    * them — the Delta/Iceberg retention model.
    */
  /** Branch-scoped commit (write-audit-publish, [[KvSink.publish]]):
    * staged files land in the table root exactly like a main commit —
    * they are data-at-rest the moment they move — but the manifest CAS
    * targets the BRANCH-LOCAL log (`manifest-<branch>-v%06d`) and the
    * `_SUCCESS` pointer is never touched, so main readers cannot see
    * the batch until an audit job publishes it. Branch appends rebase
    * within the branch log; a branch overwrite resets only the branch.
    */
  private def commitToBranch(name: String,
      fresh: Seq[(String, Long)]): Unit = {
    fresh.foreach { case (f, _) =>
      Files.move(staging.resolve(f), dir.resolve(f))
    }
    var committedV = -1L
    var attempt = 0
    while (committedV < 0) {
      val curV = KvSink.branchVersions(path, name).lastOption.getOrElse(0L)
      val prev =
        if (truncateFirst || curV == 0L) Seq.empty
        else KvSink.branchFiles(path, name)
      val manifest = (prev ++ fresh).map { case (f, n) => s"$f,$n" }
        .mkString("", "\n", "\n")
      val vtmp = staging.resolve(s"manifest-attempt-$attempt.tmp")
      Files.write(vtmp, manifest.getBytes(StandardCharsets.UTF_8))
      KvSink.onBeforeCas()
      try {
        Files.createLink(dir.resolve(f"branch-$name-v${curV + 1L}%06d"), vtmp)
        committedV = curV + 1L
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          KvSink.casRetries.incrementAndGet()
          attempt += 1
      } finally Files.deleteIfExists(vtmp)
    }
    KvSink.deleteTree(staging)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.toSeq.collect { case KvCommit(f, n) => (f, n) }.sortBy(_._1)
    branch match {
      case Some(name) => commitToBranch(name, fresh); return
      case None =>
    }
    if (truncateFirst &&
        KvSink.versions(path).lastOption.getOrElse(0L) != baseVersion)
      throw new java.util.ConcurrentModificationException(
        s"overwrite of $path planned against version $baseVersion but a " +
          "concurrent commit advanced the table — retry the whole write")
    fresh.foreach { case (f, _) =>
      Files.move(staging.resolve(f), dir.resolve(f))
    }
    var committedV = -1L
    var attempt = 0
    while (committedV < 0) {
      val curV = KvSink.versions(path).lastOption.getOrElse(0L)
      if (truncateFirst && curV != baseVersion)
        throw new java.util.ConcurrentModificationException(
          s"overwrite of $path lost the commit race at version $curV")
      // Rebase: an append extends whatever is latest NOW, not the
      // snapshot it was planned against — append ∘ append commutes.
      val prev =
        if (truncateFirst || curV == 0L) Seq.empty
        else KvSink.committedFiles(path, curV)
      val manifest = (prev ++ fresh).map { case (f, n) => s"$f,$n" }
        .mkString("", "\n", "\n")
      val vtmp = staging.resolve(s"manifest-attempt-$attempt.tmp")
      Files.write(vtmp, manifest.getBytes(StandardCharsets.UTF_8))
      KvSink.onBeforeCas()
      try {
        Files.createLink(dir.resolve(f"manifest-v${curV + 1L}%06d"), vtmp)
        committedV = curV + 1L
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          KvSink.casRetries.incrementAndGet()
          attempt += 1
      } finally Files.deleteIfExists(vtmp)
    }
    KvSink.pointerLock.synchronized {
      val latest = KvSink.versions(path).last
      val tmp = staging.resolve("_SUCCESS.tmp")
      Files.copy(dir.resolve(f"manifest-v$latest%06d"), tmp,
        StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dir.resolve("_SUCCESS"),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }
    KvSink.deleteTree(staging)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    KvSink.deleteTree(staging)
}

class KvWriterFactory(stagingDir: String, writeId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // writeId in the name keeps part files collision-free across
      // writes, so an append never overwrites a committed file
      private val fileName = s"part-$writeId-$partitionId-$taskId"
      private val target: Path = Paths.get(stagingDir, fileName)
      private val out = Files.newBufferedWriter(target, StandardCharsets.UTF_8)
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        out.write(s"${record.getLong(0)},${record.getUTF8String(1)}\n")
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        KvCommit(fileName, rows)
      }
      override def abort(): Unit = {
        out.close()
        Files.deleteIfExists(target)
      }
      override def close(): Unit = ()
    }
}
