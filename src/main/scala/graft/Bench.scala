package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout (driver contract).
  *
  * Runs every SparkEntry query against `SPARK_GRAFT_SF_DIR` and forces
  * FULL materialization through the `noop` sink (a bare `.count()`
  * would let Catalyst prune projections and undercount the real work).
  * Times exclude SparkSession startup (the honest steady-state
  * comparison per BASELINE.md).
  *
  * Every reported number is the MEDIAN OF 3 timed runs: a single-shot
  * timing on a shared machine once recorded a 2.4x phantom regression
  * on q0 from background load; the median absorbs one bad run and —
  * because the first of the three runs pays any per-query JIT/codegen
  * compile — also reports steady-state rather than cold-start. q0
  * additionally gets a dedicated untimed warm-up pass (full-corpus JIT
  * warm-up; the C reference it is compared against has no JIT to warm).
  */
object Bench {

  private val Runs = 3

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "graft-bench")

    // a failed query is flagged explicitly and the headline total is
    // NULLED — a partially-failed run (fewer summed queries) must never
    // be comparable on its deflated total, even by a consumer that
    // ignores the `failed` array. Shared by q0 and the query loop so a
    // q0 failure nulls the total like any other.
    val failed = scala.collection.mutable.ListBuffer.empty[String]

    // apples-to-apples vs BASELINE.md: the reference's own workload
    // (355-file corpus -> 26 letter files), steady-state (session
    // already up). Reference: 12.41 s sequential / 1.40 s at (4,4).
    val indexBench: Seq[(String, Double)] = {
      val manifest = "/root/reference/checker/test.txt"
      if (new java.io.File(manifest).exists()) {
        try {
          // run 0 is the untimed warm-up (JIT + codegen compile are
          // one-time costs, excluded per BASELINE.md's steady-state
          // comparison); runs 1..Runs are timed and the median reported
          val times = (0 to Runs).map { _ =>
            val out = java.nio.file.Files.createTempDirectory("graft-bench-index")
            try {
              val t0 = System.nanoTime()
              graft.operators.InvertedIndexJob.run(spark, manifest, out.toString)
              (System.nanoTime() - t0) / 1e9
            } finally deleteRecursively(out.toFile)
          }
          Seq("q0_index_corpus" -> median(times.tail))
        } catch { case e: Throwable =>
          failed += "q0_index_corpus"
          System.err.println(s"[bench] q0_index_corpus failed: ${e.getMessage}")
          Seq.empty
        }
      } else Seq.empty
    }

    val results = indexBench ++ SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val times = (1 to Runs).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        Some(name -> median(times))
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        None
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val totalJson =
      if (failed.nonEmpty) "null"
      else f"${results.map(_._2).sum}%.3f"
    println(s"""{"metric":"total","value":$totalJson,"unit":"sec","timing":"median_of_$Runs","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    // listFiles() is null on I/O error or concurrent removal, not empty
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
