package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Behavior specs for the training-prep operators: deterministic
  * shard-order shuffle, vocabulary + id encoding, and rollup-from-
  * partials maintenance. Value parity with DuckDB is the oracle gate's
  * job; these pin the invariants the hash can't express (dense
  * positions, OOV mapping, partial-merge ≡ direct aggregation) and the
  * plan shapes that matter at 100 TB (broadcast dictionary, no corpus
  * shuffle beyond the declared ones).
  */
class TrainingPrepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------- shard order

  test("shardOrder: every doc appears once, positions dense per shard") {
    val res = TrainingPrep.shardOrder(spark, sf).collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(res.length == nDocs, "one output row per document")
    assert(res.map(_.getLong(2)).distinct.length == nDocs, "doc_ids unique")
    res.groupBy(_.getLong(0)).foreach { case (shard, rows) =>
      val pos = rows.map(_.getLong(1)).sorted
      assert(pos.sameElements(1L to rows.length),
        s"shard $shard positions not dense 1..${rows.length}: ${pos.take(5).toSeq}")
    }
  }

  test("shardOrder: order is reproducible and parallelism-independent") {
    val a = TrainingPrep.shardOrder(spark, sf).collect().map(_.toSeq)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = TrainingPrep.shardOrder(spark, sf).collect().map(_.toSeq)
      assert(a.toSeq == b.toSeq, "shard order changed with partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("shardOrder: within-shard order follows the hash, not doc_id") {
    // the point of the shuffle: hash order must differ from insertion
    // order (a sorted-by-doc_id "shuffle" is not a shuffle)
    val res = TrainingPrep.shardOrder(spark, sf)
      .filter(col("shard_id") === 0).orderBy(col("position"))
      .collect().map(_.getLong(2))
    assert(!res.sameElements(res.sorted), "shard 0 emitted in doc_id order")
  }

  // --------------------------------------------------- vocab encode

  test("vocabulary: ids dense from 1, ranked by desc frequency") {
    val v = TrainingPrep.vocabulary(spark, sf, vocabSize = 64)
      .orderBy(col("token_id")).collect()
    assert(v.map(_.getLong(0)).sameElements(1L to v.length))
    val freqs = v.map(_.getLong(2))
    assert(freqs.sameElements(freqs.sortBy(-_)), "not frequency-ranked")
  }

  test("vocabEncode: id arrays match per-token lookups, OOV is 0") {
    val vocab = TrainingPrep.vocabulary(spark, sf, 256)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // token_ids is a space-joined string (gate outputs are scalar-only)
    def ids(r: org.apache.spark.sql.Row): Seq[Long] =
      r.getString(2).split(" ").filter(_.nonEmpty).map(_.toLong).toSeq
    val res = TrainingPrep.vocabEncode(spark, sf).collect()
    assert(res.nonEmpty)
    res.take(50).foreach { r =>
      val toks = docs(r.getLong(0)).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).take(12)
      val want = toks.map(t => vocab.getOrElse(t, 0L)).toSeq
      assert(ids(r) == want, s"doc ${r.getLong(0)} ids mismatch")
    }
    // the sf0.001 doc heads fit inside a 256-word vocab, so force the
    // OOV path with a deliberately tiny vocabulary
    val tiny = TrainingPrep.vocabEncode(spark, sf, vocabSize = 8).collect()
    assert(tiny.exists(ids(_).contains(0L)), "no OOV exercised")
    val tinyVocab = TrainingPrep.vocabulary(spark, sf, 8)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    tiny.take(20).foreach { r =>
      val toks = docs(r.getLong(0)).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).take(12)
      assert(ids(r) == toks.map(t => tinyVocab.getOrElse(t, 0L)).toSeq)
    }
  }

  test("vocabEncode: dictionary side is broadcast; no corpus sort-merge join") {
    val plan = TrainingPrep.vocabEncode(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for the lookup:\n$plan")
  }

  // ------------------------------------------------ rollup partials

  test("weeklyRollup: partial-merge equals direct aggregation (exact cols)") {
    // counts/min/max are algebraic — merging daily partials must be
    // EXACTLY the direct weekly aggregation, not approximately
    val viaPartials = TrainingPrep.weeklyRollup(spark, sf)
      .select(col("week"), col("event_type"), col("n_events"),
        col("min_value"), col("max_value")).collect().map(_.toSeq).toSet
    val direct = Tables.load(spark, sf, "events")
      .groupBy(weekofyear(to_date(col("ts"))).cast("long").as("week"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .select(col("week"), col("event_type"), col("n_events"),
        col("min_value"), col("max_value")).collect().map(_.toSeq).toSet
    assert(viaPartials == direct)
  }

  test("hllRollup: sketch-union estimate within 5% of the exact weekly distinct") {
    val approx = TrainingPrep.hllRollup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    val exact = Tables.load(spark, sf, "events")
      .groupBy(weekofyear(to_date(col("ts"))).cast("long").as("week"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet, "group sets differ")
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex) <= math.max(1L, (0.05 * ex).toLong),
        s"group $k: sketch $ap vs exact $ex")
    }
  }

  test("weeklyRollup: partials table is metadata-scale (days × types)") {
    val daily = TrainingPrep.dailyPartials(spark, sf)
    val nDays = Tables.load(spark, sf, "events")
      .select(to_date(col("ts"))).distinct().count()
    val nTypes = Tables.load(spark, sf, "events")
      .select(col("event_type")).distinct().count()
    assert(daily.count() <= nDays * nTypes)
  }
}
