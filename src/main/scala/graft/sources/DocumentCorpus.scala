package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-driven document source.
  *
  * The reference catalog is a manifest file: first line N, then N paths
  * (reference: `src/utils.c:3-18`, format per `Tema1a.pdf` p.4). Each
  * document gets a dense 1-based file ID assigned by MANIFEST POSITION
  * (reference: `src/mapper.c:35`), never by processing order — the
  * checker demands byte-identical output for every parallelism level,
  * so IDs must not depend on partitioning (`zipWithIndex` /
  * `monotonically_increasing_id` are therefore banned here).
  *
  * Scale posture: the manifest itself is tiny (one line per file) and is
  * read on the driver; the path→ID map is broadcast and joined against
  * `input_file_name()`, so document *content* is only ever touched by
  * executors via `spark.read.textFile`, which distributes splits across
  * the cluster. At 100 TB the manifest with ~10^7 paths is still only a
  * few hundred MB broadcast — acceptable; beyond that the map itself
  * would become a small dimension table joined by broadcast the same way.
  */
object DocumentCorpus {

  /** Read manifest: returns paths in manifest order, resolved relative
    * to the manifest's parent directory (matches the reference, which
    * resolves relative to CWD = checker dir).
    */
  def readManifest(manifestPath: String): Seq[String] = {
    val p = Paths.get(manifestPath).toAbsolutePath
    val lines = Files.readAllLines(p).asScala.toSeq.map(_.trim).filter(_.nonEmpty)
    val n = lines.head.toInt
    val dir = p.getParent
    lines.slice(1, 1 + n).map { rel =>
      val rp = Paths.get(rel)
      (if (rp.isAbsolute) rp else dir.resolve(rp)).normalize.toString
    }
  }

  /** DataFrame of (file_id INT, value STRING) — one row per text line,
    * tagged with its manifest-order file ID.
    *
    * The join is an explicit broadcast equi-join on the normalized file
    * path, so Catalyst keeps the scan fully parallel and the lookup
    * map-side (no shuffle).
    */
  def documents(spark: SparkSession, manifestPath: String): DataFrame = {
    val paths = readManifest(manifestPath)
    documentsFromPaths(spark, paths)
  }

  def documentsFromPaths(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val ids = paths.zipWithIndex.map { case (p, i) => (p, i + 1) }
    val idDf = ids.toDF("path", "file_id")
    val docs = spark.read
      .textFile(paths: _*)
      // input_file_name() yields a URI (file:///abs/path, possibly
      // URL-encoded). Normalize to a plain absolute path so it matches
      // the manifest-derived key. §7.5: this is the likeliest silent
      // determinism bug, hence the dedicated normalizer + spec.
      .withColumn("path", normalizeFileUri(input_file_name()))
    docs.join(broadcast(idDf), Seq("path"), "inner").select($"file_id", $"value")
  }

  /** `file:///a/b`, `file:/a/b`, `file://localhost/a/b` → `/a/b`; also
    * decodes %XX URL escapes (spaces in filenames).
    */
  private[graft] def normalizeFileUri(c: org.apache.spark.sql.Column) = {
    val stripped = regexp_replace(c, "^file:(//localhost|/+)?/", "/")
    // url_decode uses form-encoding semantics where '+' means space —
    // but '+' is a legal literal in URI paths (input_file_name does
    // not encode it), so protect it before decoding or a file named
    // a+b.txt silently fails the manifest join
    url_decode(regexp_replace(stripped, "\\+", "%2B"))
  }
}
