package graft.operators

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.sources.DocumentCorpus

/** End-to-end job matching the reference CLI `./tema1 <M> <R> <input>`
  * (`src/main.c:9-22`): manifest in, 26 letter files out. M and R are
  * accepted and ignored — Spark's scheduler replaces the hand-rolled
  * mapper/reducer thread pools (SURVEY §3.1); output is independent of
  * parallelism by construction.
  */
object InvertedIndexJob {

  def run(spark: SparkSession, manifestPath: String, outDir: String): Unit = {
    // the manifest is the free posting-list cardinality bound: a
    // posting list holds file ids, so |manifest| bounds every list —
    // buildGated picks hash vs sort-merge aggregation from it
    val paths = DocumentCorpus.readManifest(manifestPath)
    val docs = DocumentCorpus.documentsFromPaths(spark, paths)
    LetterTextSink.write(InvertedIndex.buildGated(docs, paths.size.toLong), outDir)
  }

  /** CLI: `run <M> <R> <manifest> [outDir]` (M/R ignored). */
  def main(args: Array[String]): Unit = {
    val (manifest, outDir) = args match {
      case Array(_, _, m)    => (m, ".")
      case Array(_, _, m, o) => (m, o)
      case Array(m, o)       => (m, o)
      case Array(m)          => (m, ".")
      case _ => sys.error("usage: InvertedIndexJob [M R] <manifest> [outDir]")
    }
    val spark = GraftSession.local()
    try run(spark, manifest, outDir)
    finally spark.stop()
  }
}
