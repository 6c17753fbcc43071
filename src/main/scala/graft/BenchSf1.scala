package graft

import org.apache.spark.sql.DataFrame

/** Synthetic-sf1 bench point for the expensive document/embedding
  * queries — the scale anchor the per-round sf0.1 bench can't give:
  * at 10× the data, shuffles stop fitting in single in-memory
  * partitions and the "would this plan survive a scale-up" claim gets
  * a measured point instead of an argument.
  *
  * The corpus is [[ScaleBench.replicaDocs]](10) over sf0.1 — 50,000
  * docs whose replica token-prefixing keeps duplicate/near-dup
  * structure ~10× the sf0.1 structure (disjoint across replicas), so
  * every op's OUTPUT also scales ~10× and a timing ratio means plan
  * cost, not workload blow-up. Embeddings are the clustered n=20,000
  * corpus (127 ≈ √n clusters), the regime the IVF/cell designs target.
  *
  * Output: the Bench contract line (medians, one JSON object) written
  * to stdout AND to `BENCH_SF1.json` in the cwd. Queries timed are the
  * sf-dir members of the r7 top-five plan audit plus the rest of the
  * text-dedup family (q0_index_corpus is excluded: its corpus is the
  * fixed 355-file reference set, which has no sf1 equivalent).
  */
object BenchSf1 {

  private val Runs = 3

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft-sf1-bench"
    val jiffiesBefore = Bench.cpuJiffies() // window-health, as in Bench
    val spark = GraftSession.local(appName = "graft-bench-sf1")

    ScaleBench.replicaDocs(spark, base, 10).write.mode("overwrite")
      .parquet(s"$work/documents.parquet")
    ScaleBench.clustered(spark, 20000, 127).write.mode("overwrite")
      .parquet(s"$work/embeddings.parquet")

    val names = Seq("q_dedup_embedding", "q_curation", "q_dedup_minhash",
      "q_dedup_simhash", "q_dedup_ngram", "q_source_overlap",
      "q_heavy_hitters",
      // round-10 document-heavy additions: the boilerplate pair's
      // bigram-df risk shape, the containment self-join, and the
      // index-shaped codec aggregate all deserve a 10x point
      "q_boilerplate", "q_boilerplate_strip", "q_dedup_containment",
      "q_posting_compression")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      noop(fn(spark, work)) // warm-up: codegen/JIT compile excluded
      name -> Seq.fill(Runs) {
        val t0 = System.nanoTime()
        noop(fn(spark, work))
        (System.nanoTime() - t0) / 1e9
      }
    }

    val medians = results.map { case (k, ts) => k -> Bench.median(ts) }
    val qs = medians.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val stealJson = (for {
      (b0, s0, _) <- jiffiesBefore
      (b1, s1, _) <- Bench.cpuJiffies()
      if b1 - b0 + s1 - s0 > 0
    } yield f"${100.0 * (s1 - s0) / ((b1 - b0) + (s1 - s0)).toDouble}%.1f")
      .getOrElse("null")
    val json = f"""{"metric":"total","value":${medians.map(_._2).sum}%.3f,"unit":"sec","timing":"median_of_runs","queries":$qs,"runs":$runsJson,"cpu_steal_pct":$stealJson,"sf":"sf1-synthetic(10x-sf0.1-replicas,20k-embeddings)"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SF1.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
