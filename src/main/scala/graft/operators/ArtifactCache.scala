package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Shared discipline for build-once /tmp artifact caches (summary
  * tables, near-dup indexes, IVF indexes): content fingerprints,
  * whole-artifact completion markers, and crash/concurrency-safe
  * publication.
  *
  * Three failure modes this closes:
  *  - STALE: a regenerated source with preserved sizes/mtimes — or a
  *    32-bit String.hashCode collision across many cached variants —
  *    serving an index built from different data. The fingerprint is
  *    a 128-bit MD5 of the (name, length, mtime) listing.
  *  - PARTIAL: a crash between two artifact writes leaving a dir whose
  *    first write's `_SUCCESS` passes while a sibling is missing.
  *    [[ensure]] writes ONE `_GRAFT_DONE` marker after the whole build.
  *  - CONCURRENT: two gate runs building the same cache path at once,
  *    each reading the other's half-written files. Builds go to a
  *    per-JVM temp dir and publish by atomic rename; the loser of the
  *    race discards its build and serves the winner's.
  */
private[graft] object ArtifactCache {

  /** pid@host — distinct for concurrent JVMs on one machine. */
  val runToken: String = java.lang.management.ManagementFactory
    .getRuntimeMXBean.getName.replaceAll("[^A-Za-z0-9]+", "_")

  /** 128-bit content-change fingerprint of a file or directory: MD5
    * over the sorted (name, length, mtime) part listing. */
  def fingerprint(src: java.io.File): String = {
    val parts = Option(src.listFiles()).map(_.toSeq).getOrElse(Seq(src))
    val listing = parts.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString(";")
    java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def isDone(path: String): Boolean = new java.io.File(s"$path/_GRAFT_DONE").exists()

  /** Observable build/hit counters for this JVM — the bench's per-run
    * instrumentation reads deltas to tell "the query re-BUILT its
    * /tmp artifact mid-battery" apart from ambient noise when
    * adjudicating a timing spike (the r16/r17 `q_media_dup_groups`
    * mid-battery double-spike hypothesis set). */
  val ensureBuilds = new java.util.concurrent.atomic.AtomicLong(0L)
  val ensureHits = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `build` into a temp sibling of `path` unless a completed
    * artifact is already published there; mark done, then publish by
    * atomic rename. Returns `path` with a complete artifact in place.
    * The leading-underscore marker name keeps Spark's parquet reader
    * from treating it as data (same convention as `_SUCCESS`).
    */
  def ensure(path: String)(build: String => Unit): String = {
    if (isDone(path)) ensureHits.incrementAndGet()
    if (!isDone(path)) {
      ensureBuilds.incrementAndGet()
      val tmp = s"$path.build-$runToken"
      deleteRecursively(new java.io.File(tmp))
      build(tmp)
      Files.createDirectories(Paths.get(tmp)) // a no-op build still publishes
      Files.write(Paths.get(s"$tmp/_GRAFT_DONE"), Array.emptyByteArray)
      Files.createDirectories(Paths.get(path).getParent)
      try Files.move(Paths.get(tmp), Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          // another run published first: serve theirs, drop ours —
          // anything else (move genuinely failed, no artifact) rethrows
          if (isDone(path)) deleteRecursively(new java.io.File(tmp)) else throw e
      }
    }
    path
  }

  /** Recursive local-FS delete — THE one copy (Bench, SummaryMv, and
    * the IVF compaction all route here; private duplicates drifted).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** True when the tree under `f` holds at least one parquet file that
    * Spark's file index would actually READ — dot- and underscore-
    * prefixed entries (hidden staging dirs like `.del-tmp`, markers
    * like `_SUCCESS`) are invisible to Spark and must be invisible to
    * data-presence checks too, or a crashed pre-commit staging dir
    * makes a store look non-empty that `spark.read` then fails on.
    * The hidden-ness check applies BELOW `f`, never to `f` itself:
    * `spark.read.parquet(".del-tmp")` reads a hidden dir's contents
    * just fine when addressed directly, and so must the presence
    * check a caller runs on its own staging dir. THE one copy for the
    * lifecycle family's walkers. */
  def hasVisibleParquet(f: java.io.File): Boolean =
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten
        .filter(c => !c.getName.startsWith(".") && !c.getName.startsWith("_"))
        .exists(hasVisibleParquet)
    else f.getName.endsWith(".parquet")

  /** `<pfx>N` subdirectories of `root` that hold visible parquet data
    * (a marker-only dir — `_SUCCESS` kept for a streaming replay
    * guard — has nothing to merge), ascending. The shared batch-dir
    * walker of the incremental-index/state family. */
  def dataBatchIds(root: String, pfx: String = "batch="): Seq[Int] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(pfx) &&
        hasVisibleParquet(f))
      .map(_.getName.stripPrefix(pfx).toInt).sorted
}
