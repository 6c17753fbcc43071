package graft.operators

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.Partitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's letter-partitioned text sink (SURVEY §2.1 O15/O16):
  * exactly 26 files `a.txt` … `z.txt` in `outDir`, each line
  * `word:[id1 id2 ...]`, rows ordered (#files DESC, word ASC), empty
  * files for letters with no words (the golden outputs contain 0-byte
  * files even though the reference C code skips them — we match the
  * spec + goldens, `Tema1a.pdf` p.6).
  *
  * Spark-first design: `DataFrameWriter.partitionBy` gives
  * `letter=a/part-*.txt` directory layout and no empty files, so this is
  * a small custom sink. We key rows by letter index and use
  * `repartitionAndSortWithinPartitions` — Spark's spill-safe external
  * sort — with a 26-way exact partitioner (NOT `repartition(26, col)`:
  * hash collisions would mix letters). Each task then streams its
  * already-sorted partition straight to its letter file; nothing is
  * buffered in memory and nothing is collected on the driver, so the
  * sink scales with the shuffle, not the driver.
  *
  * Tasks write through the Hadoop `FileSystem` API, so `outDir` may be
  * a local path (tests, matching the reference CLI), `hdfs://...`, or
  * any object-store scheme on a real cluster — same code, no driver
  * involvement beyond the final empty-file touch.
  */
object LetterTextSink {

  private final class LetterPartitioner extends Partitioner {
    override def numPartitions: Int = 26
    override def getPartition(key: Any): Int =
      key.asInstanceOf[(Int, Int, String)]._1
  }

  private def fs(dir: String, entries: Map[String, String]): FileSystem = {
    val conf = new Configuration()
    // rebuild the session's Hadoop configuration on the executor:
    // fs.defaultFS / s3a credentials / scheme impls arrive via
    // spark.hadoop.* and would be lost with a bare `new Configuration`
    entries.foreach { case (k, v) => conf.set(k, v) }
    // newInstance, NOT Path.getFileSystem: the cached JVM-wide instance
    // must not have its checksum behavior mutated for unrelated writers,
    // and conf entries are ignored on cache hits anyway. Callers close().
    val f = FileSystem.newInstance(new Path(dir).toUri, conf)
    // no .crc sidecar files: the reference emits exactly 26 files and
    // nothing else; HDFS/object stores checksum internally anyway
    f.setWriteChecksum(false)
    f
  }

  private def confEntries(index: DataFrame): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    index.sparkSession.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  /** index: (word STRING, file_ids ARRAY<INT>) → 26 letter files. */
  def write(index: DataFrame, outDir: String): Unit = {
    val hconf = confEntries(index)
    locally { val f = fs(outDir, hconf); try f.mkdirs(new Path(outDir)) finally f.close() }

    val lines = index.select(
      col("word"),
      size(col("file_ids")).as("n"),
      InvertedIndex.formattedLine(col("word"), col("file_ids")).as("line"))

    // Sort key (letterIdx ASC, -n ASC, word ASC) == the reference's
    // (#files DESC, word ASC) within each letter file.
    val keyed = lines.rdd.map { r =>
      val word = r.getString(0)
      ((word.charAt(0) - 'a', -r.getInt(1), word), r.getString(2))
    }

    keyed
      .repartitionAndSortWithinPartitions(new LetterPartitioner)
      .foreachPartition { it: Iterator[((Int, Int, String), String)] =>
        val tc = org.apache.spark.TaskContext.get()
        val letter = ('a' + tc.partitionId()).toChar
        val filesystem = fs(outDir, hconf)
        try {
        // attempt-unique tmp name: a speculative/retried attempt must
        // not share a scratch file with a zombie of the same partition
        val tmp = new Path(outDir, s".$letter.txt.tmp-${tc.taskAttemptId()}")
        val w = new BufferedWriter(new OutputStreamWriter(
          filesystem.create(tmp, true), StandardCharsets.UTF_8))
        try it.foreach { case (_, line) => w.write(line); w.write('\n') }
        finally w.close()
        // publish via FileContext.rename(OVERWRITE): atomic where the
        // FS implements overwrite-rename natively (HDFS); LocalFs falls
        // back to delete+rename internally, and schemes with no
        // AbstractFileSystem binding (s3a/gs) aren't supported by
        // FileContext at all — fall back to explicit delete+rename for
        // those rather than failing the write
        val dst = new Path(outDir, s"$letter.txt")
        try
          org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, filesystem.getConf)
            .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            filesystem.delete(dst, false)
            if (!filesystem.rename(tmp, dst))
              throw new java.io.IOException(s"rename failed: $tmp -> $dst")
        }
        } finally filesystem.close()
      }

    val filesystem = fs(outDir, hconf)
    try {
      // reap tmp files orphaned by failed/zombie attempts (each attempt
      // writes a unique name, so losers are never overwritten-away)
      ('a' to 'z').foreach { l =>
        filesystem.globStatus(new Path(outDir, s".$l.txt.tmp-*"))
          .foreach(st => filesystem.delete(st.getPath, false))
      }
      // O16: spec requires all 26 files even when empty.
      ('a' to 'z').foreach { l =>
        val f = new Path(outDir, s"$l.txt")
        if (!filesystem.exists(f)) filesystem.create(f, false).close()
      }
    } finally filesystem.close()
  }
}
