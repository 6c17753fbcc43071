package graft

/** Dev-only timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(appName = "graft-probe")
    val manifest = "/root/reference/checker/test.txt"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up on small corpus (same as bench)
    graft.operators.InvertedIndexJob.run(spark,
      "/root/reference/checker/test_small.txt", "/tmp/probe-warm")
    (1 to 3).foreach { i =>
      time(s"full run $i") {
        graft.operators.InvertedIndexJob.run(spark, manifest, s"/tmp/probe-$i")
      }
    }
    // stage decomposition
    val docs = graft.sources.DocumentCorpus.documents(spark, manifest)
    time("docs count")(docs.count())
    val pairs = graft.operators.InvertedIndex.wordFilePairs(docs)
    time("pairs count")(pairs.count())
    val idx = graft.operators.InvertedIndex.build(docs)
    time("index noop")(idx.write.format("noop").mode("overwrite").save())
    time("sink only") {
      graft.operators.LetterTextSink.write(idx, "/tmp/probe-sink")
    }
    spark.stop()
  }
}
