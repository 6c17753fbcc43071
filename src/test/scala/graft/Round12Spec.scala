package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, DatasetOps, EntityResolution, QualityAudit, Similarity}

/** Round-12 additions: BPE merge training, semantic decontamination,
  * the join-key skew profile, and union blocking for entity
  * resolution. The DuckDB oracle re-checks each at the gate; these
  * specs pin the invariants the oracle comparison can't express —
  * greedy-fold semantics, recall supersets, histogram mass
  * conservation, reference-implementation parity on the merge loop.
  */
class Round12Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // --- BPE ---------------------------------------------------------

  test("bpe applyMerge: greedy left-to-right, non-overlapping") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq("l", "l", "l")), Tuple1(Seq("a", "l", "l", "b")),
        Tuple1(Seq("l", "x", "l", "l")))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "l", "l").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    // "l l l" -> first two merge, third survives (greedy, no overlap)
    assert(out == List(List("ll", "l"), List("a", "ll", "b"),
      List("l", "x", "ll")))
  }

  test("bpeTrain matches a single-threaded reference BPE on the corpus") {
    // reference implementation: plain Scala greedy BPE over the same
    // word counts — validates the distributed loop end-to-end
    val docs = Tables.load(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val words = scala.collection.mutable.Map.empty[List[String], Long]
    for (d <- docs; w <- d.toLowerCase.split("\\s+") if w.nonEmpty) {
      val syms = w.map(_.toString).toList :+ "</w>"
      words(syms) = words.getOrElse(syms, 0L) + 1L
    }
    def pairCounts(ws: Map[List[String], Long]): Map[(String, String), Long] =
      ws.toSeq.flatMap { case (syms, n) =>
        syms.zip(syms.tail).map(p => p -> n)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    def merge(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (l + r)
        else acc :+ x
      }
    var ws = words.toMap
    val expect = (1 to 8).map { step =>
      val pc = pairCounts(ws)
      val ((l, r), c) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      ws = ws.map { case (syms, n) => merge(syms, l, r) -> n }
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
      (step, l, r, l + r, c)
    }
    val got = Bpe.bpeTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == expect)
  }

  test("bpeEncode matches reference encoding: token counts and heads") {
    // reference: train 8 merges single-threaded (as above), then encode
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def tokens(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val words = scala.collection.mutable.Map.empty[List[String], Long]
    for ((_, t) <- docs; w <- tokens(t)) {
      val syms = w.map(_.toString).toList :+ "</w>"
      words(syms) = words.getOrElse(syms, 0L) + 1L
    }
    def merge(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    var ws = words.toMap
    var merges = List.empty[(String, String)]
    for (_ <- 1 to 8) {
      val pc = ws.toSeq.flatMap { case (syms, n) =>
        syms.zip(syms.tail).map(p => p -> n)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val ((l, r), _) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      merges :+= ((l, r))
      ws = ws.map { case (syms, n) => merge(syms, l, r) -> n }
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    }
    def encodeWord(w: String): List[String] =
      merges.foldLeft(w.map(_.toString).toList :+ "</w>") {
        case (syms, (l, r)) => merge(syms, l, r)
      }
    val expect = docs.filter { case (_, t) => tokens(t).nonEmpty }
      .map { case (id, t) =>
        val enc = tokens(t).toList.flatMap(encodeWord)
        (id, enc.size.toLong, enc.take(12).mkString(" "))
      }.sortBy(_._1).toList
    val got = graft.operators.Bpe.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(got == expect)
  }

  test("bpeTrainFromCounts: empty dictionary yields a schema-correct " +
    "empty merge table") {
    import spark.implicits._
    val counts = Seq.empty[(String, Long)].toDF("word", "cnt")
    val out = graft.operators.Bpe.bpeTrainFromCounts(spark, counts)
    assert(out.columns.toSeq ==
      Seq("step", "lhs", "rhs", "merged", "pair_count"))
    assert(out.count() == 0)
  }

  test("applyMerge: agrees with the reference greedy fold on random " +
    "symbol sequences") {
    import spark.implicits._
    def refMerge(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "ab", "ba", "</w>")
    val cases = (1 to 200).map { _ =>
      List.fill(rnd.nextInt(10) + 1)(alphabet(rnd.nextInt(alphabet.size)))
    }
    for ((l, r) <- Seq(("a", "b"), ("a", "a"), ("ab", "</w>"), ("b", "ba"))) {
      val got = cases.map(Tuple1(_)).toDF("syms")
        .select(graft.operators.Bpe.applyMerge(col("syms"), l, r).as("m"))
        .collect().map(_.getSeq[String](0).toList)
      val expect = cases.map(refMerge(_, l, r))
      got.zip(expect).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g == e, s"case ${cases(i)} merge ($l,$r): got $g want $e")
      }
    }
  }

  test("bpeTrainFromCounts: stops early when the pair vocabulary " +
    "exhausts; merge table is the completed rounds only") {
    import spark.implicits._
    // words "ab"/"cd": round 1 merges (a,b)->ab? counts: pairs
    // (a,b),(b,</w>),(c,d),(d,</w>) all cnt 1 -> ties by (lhs,rhs):
    // (a,b) first; then (ab,</w>) etc. — after enough rounds every
    // word is ONE symbol and pairs vanish before 8 rounds
    val counts = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "cnt")
    val merges = graft.operators.Bpe.bpeTrainFromCounts(spark, counts).collect()
    assert(merges.length < 8 && merges.length >= 4,
      s"expected early stop after both words fully merge, got ${merges.length}")
    // every word contributes 2 merges (chars+marker = 3 symbols -> 1)
    assert(merges.length == 4)
  }

  test("bpeEncodeHeldOut: open-vocabulary — an unseen word still " +
    "encodes through the learned merge chain") {
    // reference: train on the split, encode EVERYTHING (incl. words
    // the trainer never saw) by greedy merge application
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def tokens(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def merge(syms: List[String], l: String, r: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    val words = scala.collection.mutable.Map.empty[List[String], Long]
    for ((id, t) <- docs if id % 97 != 0; w <- tokens(t)) {
      val syms = w.map(_.toString).toList :+ "</w>"
      words(syms) = words.getOrElse(syms, 0L) + 1L
    }
    var ws = words.toMap
    var merges = List.empty[(String, String)]
    for (_ <- 1 to 8) {
      val pc = ws.toSeq.flatMap { case (syms, n) =>
        syms.zip(syms.tail).map(p => p -> n)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val ((l, r), _) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      merges :+= ((l, r))
      ws = ws.map { case (syms, n) => merge(syms, l, r) -> n }
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    }
    def encodeWord(w: String): List[String] =
      merges.foldLeft(w.map(_.toString).toList :+ "</w>") {
        case (syms, (l, r)) => merge(syms, l, r)
      }
    val expect = docs.filter { case (_, t) => tokens(t).nonEmpty }
      .map { case (id, t) =>
        val enc = tokens(t).toList.flatMap(encodeWord)
        (id, enc.size.toLong, enc.take(12).mkString(" "))
      }.sortBy(_._1).toList
    val got = graft.operators.Bpe.bpeEncodeHeldOut(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(got == expect)
    // the held-out docs (never seen in training) are in the output —
    // the open-vocabulary property the dictionary-join encode lacks
    assert(got.exists(_._1 % 97 == 0), "held-out docs must encode")
  }

  test("maintainDictionary: staged per-batch counts rebuild the exact " +
    "corpus dictionary; training from it reproduces the corpus merges") {
    // 4-file staged source -> 4 micro-batches; plant a leftover at the
    // output path (must be overwritten from staging, never merged into)
    val staged = java.nio.file.Files.createTempDirectory("graft-dict-src").toString
    Tables.load(spark, sf, "documents").select(col("text"))
      .repartition(4).write.mode("overwrite").parquet(staged)
    val parent = java.nio.file.Files.createTempDirectory("graft-dict").toString
    val path = s"$parent/words"
    graft.operators.Bpe.wordCounts(
        Tables.load(spark, sf, "documents").select(col("text")).limit(5))
      .write.mode("overwrite").parquet(path)
    val src = spark.readStream.schema("text STRING")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = graft.streaming.EventStream.maintainDictionary(src, path)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.map(_.numInputRows).count(_ > 0) > 1,
      "source must actually chop into multiple micro-batches")
    val streamed = spark.read.parquet(path)
    val batch = graft.operators.Bpe.wordCounts(
      Tables.load(spark, sf, "documents").select(col("text")))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "maintained dictionary must equal the one-shot corpus dictionary")
    // replay idempotence: rebuilding over unchanged staging is a no-op
    val staging = new java.io.File(parent).listFiles()
      .map(_.toString).filter(_.contains("words.batches-")).head
    val before = streamed.orderBy(col("word")).collect().toSeq
    graft.streaming.EventStream.rebuildDictionary(spark, staging, path)
    assert(spark.read.parquet(path).orderBy(col("word")).collect().toSeq == before)
    // merges trained from the maintained counts == corpus train
    val fromDict = graft.operators.Bpe
      .bpeTrainFromCounts(spark, spark.read.parquet(path)).collect().toSeq
    val fromCorpus = graft.operators.Bpe.bpeTrain(spark, sf).collect().toSeq
    assert(fromDict == fromCorpus)
  }

  test("bigramCrossEntropy matches an independent in-test recompute " +
    "(model totals, smoothing, per-doc mean) on every document") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val allBigrams = docs.flatMap { case (_, t) =>
      val w = toks(t); w.zip(w.drop(1))
    }
    val bn = allBigrams.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val un = bn.groupBy(_._1._1).map { case (a, xs) => a -> xs.values.sum }
    val v = bn.keys.map(_._2).toSet.size
    val k = 0.5
    val expect = docs.flatMap { case (id, t) =>
      val w = toks(t); val bgs = w.zip(w.drop(1))
      if (bgs.isEmpty) None
      else {
        val h = bgs.map { g =>
          -(math.log((bn(g) + k) / (un(g._1) + k * v)) / math.log(2.0))
        }.sum / bgs.length
        Some(id -> (math.floor(h * 10000 + 0.5) / 10000))
      }
    }.toMap
    val got = graft.operators.Selection.bigramCrossEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet)
    for ((id, h) <- got)
      assert(math.abs(h - expect(id)) < 1e-9, s"doc $id: $h vs ${expect(id)}")
  }

  // --- semantic decontam -------------------------------------------

  test("semanticDecontam: rows are train-side only, counts bounded by " +
    "eval size, every reported hit verified by brute-force cosine") {
    val hits = DatasetOps.semanticDecontam(spark, sf).collect()
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val evalIds = vecs.keySet.filter(_ % 97 == 0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(hits.nonEmpty, "threshold must fire on the test corpus")
    for (h <- hits) {
      val id = h.getLong(0); val n = h.getLong(1)
      assert(id % 97 != 0, s"eval vec $id reported as train")
      assert(n >= 1 && n <= evalIds.size)
      val brute = evalIds.count(e => cos(vecs(id), vecs(e)) >= 0.4)
      assert(brute == n, s"vec $id: brute=$brute reported=$n")
    }
    // and no contaminated vec is missing
    val reported = hits.map(_.getLong(0)).toSet
    for ((id, v) <- vecs if id % 97 != 0) {
      val isHit = evalIds.exists(e => cos(v, vecs(e)) >= 0.4)
      assert(isHit == reported.contains(id), s"vec $id membership")
    }
  }

  // --- plan shapes -------------------------------------------------

  test("plan shapes: encode joins broadcast (corpus never shuffled for " +
    "the lookup); semantic decontam is a broadcast nested loop") {
    val enc = graft.operators.Bpe.bpeEncode(spark, sf)
      .queryExecution.executedPlan.toString
    assert(enc.contains("BroadcastHashJoin"), s"dict join not broadcast:\n$enc")
    assert(!enc.contains("SortMergeJoin"), s"corpus shuffled for the lookup:\n$enc")
    val oov = graft.operators.Bpe.bpeEncodeHeldOut(spark, sf)
      .queryExecution.executedPlan.toString
    assert(oov.contains("BroadcastHashJoin"), s"oov dict join not broadcast:\n$oov")
    assert(!oov.contains("SortMergeJoin"), s"oov corpus shuffled:\n$oov")
    val dec = graft.operators.DatasetOps.semanticDecontam(spark, sf)
      .queryExecution.executedPlan.toString
    assert(dec.contains("BroadcastNestedLoopJoin"),
      s"eval side not broadcast into the condition:\n$dec")
  }

  // --- skew profile ------------------------------------------------

  test("skewProfile: buckets partition the keys, mass conserved, " +
    "bucket bounds respected") {
    val prof = QualityAudit.skewProfile(spark, sf).collect()
    val byRel = prof.groupBy(_.getString(0))
    assert(byRel.keySet == Set("lineitem.l_orderkey", "orders.o_custkey",
      "events.user_id"))
    val expect = Map(
      "lineitem.l_orderkey" ->
        Tables.load(spark, sf, "lineitem").select(countDistinct(col("l_orderkey")),
          count(lit(1))).first(),
      "orders.o_custkey" ->
        Tables.load(spark, sf, "orders").select(countDistinct(col("o_custkey")),
          count(lit(1))).first(),
      "events.user_id" ->
        Tables.load(spark, sf, "events").select(countDistinct(col("user_id")),
          count(lit(1))).first())
    for ((rel, rows) <- byRel) {
      assert(rows.map(_.getLong(2)).sum == expect(rel).getLong(0),
        s"$rel: n_keys must sum to distinct keys")
      assert(rows.map(_.getLong(3)).sum == expect(rel).getLong(1),
        s"$rel: n_rows must sum to table rows")
      for (r <- rows) {
        val b = r.getInt(1)
        val lo = 1L << b; val hi = (1L << (b + 1)) - 1
        assert(r.getLong(4) >= lo && r.getLong(5) <= hi,
          s"$rel bucket $b: [${r.getLong(4)}, ${r.getLong(5)}] outside [$lo, $hi]")
      }
    }
  }

  // --- union blocking ----------------------------------------------

  test("union blocking: superset of head-noun name matches, catches a " +
    "first-token-only pair iff one exists, no pair below either key") {
    val uni = EntityResolution.fuzzyNamesUnionBlocked(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // brute-force ground truth over distinct names
    val names = Tables.load(spark, sf, "part")
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val all = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 2
    } yield (a, b)).toSet
    def last(s: String) = s.split(" ").last
    def first(s: String) = s.split(" ").head
    val expected = all.filter { case (a, b) =>
      last(a) == last(b) || first(a) == first(b) }
    assert(uni == expected, "union blocking = brute force restricted to either key")
    val headOnly = all.filter { case (a, b) => last(a) == last(b) }
    assert(headOnly.subsetOf(uni), "superset of single-key blocking")
  }
}
