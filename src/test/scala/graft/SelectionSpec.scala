package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Behavior specs for the data-selection scorers. Value parity with
  * DuckDB is the oracle gate's job; these pin the semantics the hash
  * can't express: surprisal's relationship to token rarity, the
  * importance weights' direction (target-like docs score higher), the
  * fixed model width, and the semantic-keep decision rule against an
  * independently computed brute-force pair graph.
  */
class SelectionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("surprisal: one row per tokenized doc, values positive and finite") {
    val res = Selection.surprisal(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0).count()
    assert(res.length == nDocs, "one row per non-empty document")
    res.foreach { r =>
      val v = r.getDouble(2)
      assert(!v.isNaN && !v.isInfinite && v > 0, s"bad surprisal $v")
    }
  }

  test("surprisal: a doc of corpus-unique tokens outranks a doc of its stopwords") {
    // independent recount on a constructed corpus: surprisal of a doc
    // made of the corpus's most frequent token must be the corpus
    // minimum; a doc of hapaxes must be the maximum
    val docs = Selection.surprisal(spark, sf)
      .join(Tables.load(spark, sf, "documents").select(col("doc_id"), col("text")), "doc_id")
      .collect()
    // corpus-wide token counts, recomputed in plain Scala
    val counts = docs.flatMap(_.getString(3).toLowerCase.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val total = counts.values.sum.toDouble
    docs.foreach { r =>
      val toks = r.getString(3).toLowerCase.split("\\s+").filter(_.nonEmpty)
      val want = toks.map(t => -math.log(counts(t) / total)).sum / toks.length
      assert(math.abs(r.getDouble(2) - want) < 1e-3,
        s"doc ${r.getLong(0)}: engine ${r.getDouble(2)} vs recount $want")
    }
  }

  test("dsirWeights: target-language docs average a higher log-weight than the rest") {
    val res = Selection.dsirWeights(spark, sf).collect()
    val (en, other) = res.partition(_.getString(1) == "en")
    assert(en.nonEmpty && other.nonEmpty, "need both classes in testdata")
    // normalize by length: the LLR sum grows with n_tokens
    def meanPerTok(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getDouble(3) / r.getLong(2)).sum / rs.length
    assert(meanPerTok(en) > meanPerTok(other),
      s"en ${meanPerTok(en)} should exceed non-en ${meanPerTok(other)}")
  }

  test("dsirWeights: model is bounded at 256 buckets regardless of vocab") {
    // the scale claim: the weight model is fixed-width. Count distinct
    // buckets actually materialized by the same md5 bucketing.
    val t = Tables.load(spark, sf, "documents")
      .select(explode(filter(split(lower(col("text")), "\\s+"),
        t => length(t) > 0)).as("tok"))
      .select(substring(md5(col("tok")), 1, 2).as("b"))
    assert(t.distinct().count() <= 256)
  }

  test("semanticKeep: decision matches a brute-force pair graph recount") {
    val res = Selection.semanticKeep(spark, sf, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force cosine pairs in plain Scala
    val vecs = Similarity.emb(spark, sf)
      .select(col("vec_id"), col("emb"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val dupOf = scala.collection.mutable.Map[Long, Long]()
    for {
      (ia, va, na) <- vecs; (ib, vb, nb) <- vecs
      if ia < ib && na > 0 && nb > 0
      cos = va.zip(vb).map { case (x, y) => x * y }.sum / (na * nb)
      if cos >= 0.4
    } dupOf(ib) = math.min(dupOf.getOrElse(ib, Long.MaxValue), ia)
    res.foreach { case (id, kept, d) =>
      val want = dupOf.get(id)
      assert(kept == (if (want.isEmpty) 1L else 0L), s"vec $id kept=$kept vs $want")
      assert(d == want.getOrElse(-1L), s"vec $id dup_of=$d vs $want")
    }
    assert(res.count(_._2 == 0L) > 0, "testdata should contain at least one drop")
  }

  test("surprisal: corpus is tokenized once (counts/total reuse the tf exchange)") {
    // counts and total derive from the tf aggregate, so all three
    // branches share one scan→Generate→Exchange subtree. AQE decides
    // stage reuse at RUNTIME (canonicalized-equal shuffle stages), so
    // execute first, then read the final adaptive plan: the reused
    // branches must show up as reuse nodes, not extra Generates.
    val df = Selection.surprisal(spark, sf)
    df.collect()
    // AQE's toString appends the pre-execution "== Initial Plan ==";
    // only the final adaptive section reflects what actually ran
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val generates = "Generate explode".r.findAllIn(plan).size
    assert(generates == 1, s"expected 1 tokenize pass, got $generates:\n$plan")
    assert(plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"),
      s"no exchange/stage reuse in:\n$plan")
  }

  test("dsirWeights: one model pass + one scoring pass (two tokenizes, no more)") {
    val df = Selection.dsirWeights(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val generates = "Generate explode".r.findAllIn(plan).size
    assert(generates <= 2, s"expected <=2 tokenize passes, got $generates:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"weights not broadcast in:\n$plan")
  }

  test("semanticKeep: every vec_id appears exactly once") {
    val ids = Selection.semanticKeep(spark, sf, 0.4).collect().map(_.getLong(0))
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(ids.length == n && ids.distinct.length == n)
  }
}
