package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters
import graft.operators.{Similarity, TextQueries}

class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("kmeans-refined IVF recall is at least as good as fixed seeds") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = pairs(Similarity.knnBruteForce(spark, sf))
    val fixed = pairs(Similarity.knnIvf(spark, sf))
    val refined = pairs(Similarity.knnIvf(spark, sf, kmeansIters = 2))
    val rFixed = brute.intersect(fixed).size.toDouble / brute.size
    val rRefined = brute.intersect(refined).size.toDouble / brute.size
    info(s"recall fixed=$rFixed refined=$rRefined")
    assert(rRefined >= 0.3, s"refined recall collapsed: $rRefined")
    // deterministic across invocations
    assert(refined == pairs(Similarity.knnIvf(spark, sf, kmeansIters = 2)))
  }

  test("approx_percentile tracks the exact percentile within 5% per group") {
    graft.operators.Relational.approxPercentiles(spark, sf).collect().foreach { r =>
      val (apxMed, exaMed) = (r.getDouble(1), r.getDouble(3))
      assert(math.abs(apxMed - exaMed) / exaMed < 0.05,
        s"${r.getString(0)}: approx median $apxMed vs exact $exaMed")
      // p90 must sit above the median for any real price distribution
      assert(r.getDouble(2) >= apxMed)
    }
  }

  test("heavy hitters finds exactly the truly frequent words with CMS over-estimate bound") {
    // SAME normalization as the inverted index / q_doc_index, so the
    // sketch's word universe cross-checks against the index below
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .select(graft.operators.InvertedIndex.normalizeToken(col("tok")).as("word"))
      .filter(length(col("word")) > 0)
    val exact = toks.groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 500).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hh = HeavyHitters.frequentWords(spark, toks, "word", minCount = 500)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "testdata should contain frequent words")
    // every true heavy hitter is found, estimate >= true count (CMS never undercounts)
    exact.foreach { case (w, n) =>
      assert(hh.contains(w), s"missed heavy hitter $w ($n)")
      assert(hh(w) >= n, s"CMS undercounted $w: ${hh(w)} < $n")
      assert(hh(w) <= n * 2, s"CMS estimate wildly high for $w: ${hh(w)} vs $n")
    }
    // cross-check vs the index's word universe: a word frequent in the
    // corpus must be indexed, and its doc frequency can never exceed
    // its term frequency
    val docFreq = TextQueries.wordDocPairs(Tables.load(spark, sf, "documents"))
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, n) =>
      assert(docFreq.contains(w), s"heavy hitter $w missing from the doc index")
      assert(docFreq(w) <= n, s"df ${docFreq(w)} exceeds tf $n for $w")
    }
  }
}
