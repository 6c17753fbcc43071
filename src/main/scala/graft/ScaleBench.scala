package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DatasetOps, Dedup, Similarity}

/** Scale-growth probe for the dedup/ANN family: times every near-dup
  * variant at sf0.1 (1×) and on synthesized 10× and 100× corpora and
  * reports the growth ratio per decade. The designs are all bucketed
  * candidate generation + exact verify, so 10× data must cost ~10×
  * time — a quadratic regression shows up as a per-decade ratio far
  * above 10. Prints one JSON line.
  *
  * 10×/100× documents: N replicas of sf0.1 documents; replica r
  * prefixes EVERY whitespace token with a distinct two-letter code
  * (`aa`, `ab`, …). Docs within a replica keep their dup/near-dup
  * structure (both members of a planted pair transform identically);
  * tokens from different replicas differ in their first two chars by
  * construction — for ANY token alphabet, digits and punctuation
  * included, unlike the previous rotated-`translate` scheme whose
  * disjointness silently assumed pure a–z tokens — so replicas share
  * no shingles and duplicate-pair output grows ~N× with the corpus
  * instead of ~N² (cross-replica dups would make the workload itself
  * quadratic and mask the plan's scaling).
  *
  * Embeddings: clustered corpora at n=2000 (41 clusters), n=20000
  * (127), n=200000 (401), 32 dims, 2% coordinate noise. Cluster count
  * grows ~√n so cluster structure stays within the index's √n-cell
  * capacity — the regime where both member count per cluster and
  * cluster count grow with the crawl, as web-scale duplicate density
  * does. (Seeds are hash-selected since r7, so coverage no longer
  * depends on id/cluster arithmetic; the prime counts are kept for
  * continuity with earlier measurements.) Also reports the cell-prune
  * keep rate at each scale: the triangle-inequality prune must keep
  * pruning as C grows.
  */
object ScaleBench {

  private val Runs = 3

  // Bench.median (true even-size median) — shared so the two benches
  // can't diverge on median semantics
  private def timed(body: () => DataFrame): Double =
    Bench.median(Seq.fill(Runs) {
      val t0 = System.nanoTime()
      body().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    })

  /** N disjoint replicas of a documents corpus: replica r prefixes
    * EVERY whitespace token with a distinct two-letter code (see class
    * doc — disjoint for any token alphabet). Shared with [[BenchSf1]],
    * whose synthetic sf1 point is 10 replicas of sf0.1.
    */
  /** Bump when the [[replicaDocs]] synthesis changes — part of the
    * replica-corpus cache marker so cached corpora can never silently
    * serve a stale recipe. */
  private[graft] val ReplicaSynthVer = "s1"

  private[graft] def replicaDocs(spark: SparkSession, base: String,
      n: Int): DataFrame = {
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val d = Tables.load(spark, base, "documents")
    val off = d.agg(max(col("doc_id"))).first().getLong(0) + 1
    (0 until n).map { r =>
      val code = s"${alpha(r / 26)}${alpha(r % 26)}"
      d.select((col("doc_id") + lit(r.toLong * off)).as("doc_id"),
        regexp_replace(lower(col("text")), "(\\S+)", code + "$1").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
  }

  /** Clustered unit-sphere corpus: k centers, members = normalized
    * center + small coordinate noise. Deterministic. Shared with
    * [[BenchSf1]].
    */
  private[graft] def clustered(spark: SparkSession, n: Int, k: Int, dims: Int = 32,
      seed: Int = 7): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(k)(Array.fill(dims)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % k)
      val nrm = math.sqrt(c.map(x => x * x).sum)
      (i.toLong, c.map(x => x / nrm + 0.02 * rnd.nextGaussian()).toSeq, i % k)
    }.toDF("vec_id", "embedding", "label")
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/tmp/graft-scale"
    // same window-health telemetry as Bench: an r8 scale run measured
    // minhash 1x at 116x its committed time WITH 10x "faster" than 1x —
    // per-decade ratios are only meaningful when the window isn't
    // host-throttled, and steal share is the signal loadavg can't see
    val jiffiesBefore = Bench.cpuJiffies()
    val spark = GraftSession.local(appName = "graft-scalebench")

    // ---------------- synthesize the 10× and 100× documents corpora.
    // Regenerated ONLY when the base corpus changed (marker carries the
    // base fingerprint): stability matters beyond the untimed setup
    // cost — downstream build-once state (the takedown's pre-built
    // group state below) is keyed by the replica corpus' own
    // fingerprint, and an unconditional rewrite would mint fresh
    // mtimes every invocation and void that cache, re-paying the 100×
    // state build per run.
    val d = Tables.load(spark, base, "documents")
    val dir10 = s"$work/sf1"
    val dir100 = s"$work/sf10"
    val baseFp = graft.operators.ArtifactCache.fingerprint(
      new java.io.File(s"$base/documents.parquet"))
    def ensureReplicas(dir: String, n: Int): Unit = {
      // ReplicaSynthVer folds the SYNTHESIS recipe into the cache key:
      // a change to [[replicaDocs]] must invalidate cached corpora the
      // same way a base-corpus change does (the stale-artifact class
      // PlanVer guards against in Similarity.ensurePlan)
      val marker = new java.io.File(s"$dir/_REPLICAS-$baseFp-x$n-$ReplicaSynthVer")
      if (!marker.exists()) {
        replicaDocs(spark, base, n).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
        Option(new java.io.File(dir).listFiles()).toSeq.flatten
          .filter(_.getName.startsWith("_REPLICAS-")).foreach(_.delete())
        java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      }
    }
    ensureReplicas(dir10, 10)
    ensureReplicas(dir100, 100)

    // ---------------- synthesize clustered embeddings at n, 10n, 100n
    // (prime cluster counts near √n — see class doc; 100× extends the
    // flagship embedding ops to a 3-point growth curve)
    val emb1xDir = s"$work/emb1x"; val emb10xDir = s"$work/emb10x"
    val emb100xDir = s"$work/emb100x"
    clustered(spark, 2000, 41).write.mode("overwrite").parquet(s"$emb1xDir/embeddings.parquet")
    clustered(spark, 20000, 127).write.mode("overwrite").parquet(s"$emb10xDir/embeddings.parquet")
    clustered(spark, 200000, 401).write.mode("overwrite").parquet(s"$emb100xDir/embeddings.parquet")

    // ---------------- time each op across its scale points (third
    // element = how many of the 1×/10×/100× dirs to time)
    val docDirs = Seq(base, dir10, dir100)
    val docOps: Seq[(String, String => DataFrame, Int)] = Seq(
      ("dedup_exact", dir => Dedup.exactGroups(spark, dir), 3),
      ("dedup_minhash", dir => Dedup.minhashNearDups(spark, dir), 3),
      ("dedup_simhash", dir => Dedup.simhashNearDups(spark, dir), 3),
      ("dedup_ngram", dir => Dedup.ngramJaccardDups(spark, dir), 3),
      // the slowest DatasetOps query: its trigram fan-out rides the
      // same df cap as the dedup family, so a quadratic regression
      // would show here first. 1×/10× (two scale points bound the
      // per-decade ratio; the op is per-source-PAIR downstream, and
      // replicas keep source names, so 100× mostly multiplies the
      // pair counts, not the shape)
      ("source_overlap", dir => DatasetOps.sourceOverlapMatrix(spark, dir), 2),
      // round-9 training-prep ops: shard_order is a narrow hash
      // projection + per-shard windows (must be ~linear); vocab_encode
      // tokenizes the corpus twice (vocab count + encode) with a
      // dictionary ranking whose input is DISTINCT tokens — replicas
      // multiply the distinct-token universe too, so this also guards
      // the global ranking window as vocabulary grows
      ("shard_order", dir => graft.operators.TrainingPrep.shardOrder(spark, dir), 3),
      ("vocab_encode", dir => graft.operators.TrainingPrep.vocabEncode(spark, dir), 3),
      // round-10: boilerplate's risk shape is the bigram df aggregate
      // feeding a TakeOrdered top-k — replicas multiply the gram
      // vocabulary 10×/100× (disjoint prefixes), so this guards both
      // the df aggregation and the top-k selection as grams grow; the
      // scoring leg must stay ∝ corpus (broadcast join, no shuffle)
      ("boilerplate", dir => graft.operators.TextQueries.boilerplate(spark, dir), 3),
      // round-12: bigram-LM scoring — replicas multiply the bigram
      // vocabulary (disjoint prefixes), so this guards the model
      // aggregations and the bigram-keyed scoring join as the bigram
      // universe grows 10×/100×
      ("bigram_lm", dir => graft.operators.Selection.bigramCrossEntropy(spark, dir), 3),
      // round-13: audio landmark matching — replicas multiply tracks,
      // clips AND per-key landmark collisions (the 16-bit key space is
      // fixed, so probe-join fan-out grows with corpus until the
      // MaxKeyDf cap binds); this curve guards exactly that join — it
      // must stay ≤ clip-landmarks × MaxKeyDf, never corpus²
      ("audio_match", dir => graft.operators.AudioMatch.matchClips(spark, dir), 3),
      // round-14: the reworked exact media audit — candidates from ONE
      // gram-keyed groupBy(collect_set) + map-side pair explode. This
      // was the last super-linear operator (7.07×/decade pre-rework);
      // the 3-point curve pins the new shape across TWO decades: the
      // window relation grows ∝ bytes, the df cap bounds per-window
      // fan-out, so the decade ratio must stay far under quadratic
      ("media_neardups_exact",
        dir => graft.operators.Multimodal.mediaNearDupsExact(spark, dir), 3),
      // round-16: the LINEAR-OUTPUT group form of the same audit. The
      // pair form above is output-bound on the dup-dense replica
      // corpus (124M pairs at 100× — a quadratic encoding of
      // near-clique groups, 5.56×/decade in r15); the group form
      // streams candidates un-deduplicated through map-side union-find
      // contraction and emits one row per MEMBER, so its decade ratio
      // measures the plan, not the encoding
      ("media_dup_groups",
        dir => graft.operators.Multimodal.mediaDupGroups(spark, dir), 3),
      // its sampled production sibling (CDC anchors → MinHash/LSH)
      ("media_neardups",
        dir => graft.operators.Multimodal.mediaNearDups(spark, dir), 3))
    val embOps: Seq[(String, String => DataFrame)] = Seq(
      "dedup_embedding" -> (dir => Dedup.embeddingNearDups(spark, dir, 0.9)),
      "knn_ivf" -> (dir => Similarity.knnIvf(spark, dir)))

    // round-12: the late-wave relational ops get their own 3-point
    // curve over sf0.01 → sf0.1 → a key-coherent synthetic sf1
    // ([[BenchSf1.replicate]] — joins keep their sf0.1 selectivity, so
    // the ratio measures plan cost). Note entity_match CROSSES its
    // block cap between sf0.1 and sf1 by design: above the cap it
    // degrades to representative pairs (output ∝ matched name pairs,
    // not row pairs), so its last point measures the fallback path —
    // the documented graceful-degradation contract, not a free lunch.
    val relSf1 = s"$work/rel-sf1"
    val relMarker = new java.io.File(s"$relSf1/_REPLICATED")
    if (!relMarker.exists()) {
      BenchSf1.replicate(spark, base, relSf1)
      relMarker.createNewFile()
    }
    // the 1× point of the relational curve is fixed at sf0.01; a base
    // that IS sf0.01 would make the first two points time the same
    // dataset and publish meaningless growth ratios — fail loudly
    val rel1x = "/root/testdata/sf0.01"
    require(new java.io.File(base).getCanonicalPath !=
      new java.io.File(rel1x).getCanonicalPath,
      s"relational scale curve needs base != $rel1x (its fixed 1x point)")
    val relDirs = Seq(rel1x, base, relSf1)
    val relOps: Seq[(String, String => DataFrame)] = Seq(
      "entity_match" -> (dir => graft.operators.EntityResolution.fuzzyParts(spark, dir)),
      "pagerank" -> (dir => graft.operators.Graphs.pageRank(spark, dir)),
      "dq_audit" -> (dir => graft.operators.QualityAudit.audit(spark, dir)),
      "time_decay" -> (dir => graft.operators.EventsQueries.timeDecayedValue(spark, dir)),
      // round-12 additions: bpe_train's corpus scan grows with data
      // AND its vocabulary grows ~N× with replicas (each replica
      // prefixes tokens with a distinct code, adding new distinct
      // words by construction), so the curve measures scan plus
      // vocab-proportional merge rounds together — both legs must
      // stay near-linear for the point to pass; skew_profile is two
      // hash aggs; union blocking is vocab², near-flat here because
      // replication adds no new names (the TPC-H name vocabulary is
      // ~92 color words — see the maxBlock cap for the regime where
      // distinct names DO grow)
      "bpe_train" -> (dir => graft.operators.Bpe.bpeTrain(spark, dir)),
      "skew_profile" -> (dir => graft.operators.QualityAudit.skewProfile(spark, dir)),
      "entity_match_union" -> (dir =>
        graft.operators.EntityResolution.fuzzyNamesUnionBlocked(spark, dir)),
      "decontam_semantic" -> (dir =>
        graft.operators.DatasetOps.semanticDecontam(spark, dir)))

    // ops whose OUTPUT SIZE is the adjudication axis: the exact media
    // pair audit is output-bound by construction (dup groups are
    // near-cliques, pairs a quadratic encoding of them), and that
    // claim must be committed data, not narrative — record emitted
    // rows per scale point next to the times (one count run each; the
    // group form's member-linear count sits beside it for contrast).
    // bigram_lm joined the set in r19: its 3.71×/decade curve was the
    // steepest row with no row-count adjudication — the op scores one
    // row per DOCUMENT, so n_rows growing ~10×/decade pins the steeper
    // time ratio on the bigram-model join's fan-out, not on output
    val countOps = Set("media_neardups_exact", "media_dup_groups",
      "media_neardups", "bigram_lm")
    var tdAffected: Option[String] = None
    val rows: Seq[(String, Seq[Double], Option[Seq[Long]])] =
      docOps.map { case (name, fn, nScales) =>
        val dirs = docDirs.take(nScales)
        (name, dirs.map(d => timed(() => fn(d))),
          if (countOps(name)) Some(dirs.map(d => fn(d).count())) else None)
    } ++ embOps.map { case (name, fn) =>
      (name, Seq(timed(() => fn(emb1xDir)), timed(() => fn(emb10xDir)),
        timed(() => fn(emb100xDir))), None)
    } ++ relOps.map { case (name, fn) =>
      (name, relDirs.map(d => timed(() => fn(d))), None)
    } ++ {
      // round-17/18: group-state takedown. The two-generation
      // incremental state is built once per scale point (untimed —
      // ingest cost is the incremental op's own curve — and CACHED
      // across invocations: the state dir is fingerprint-keyed and the
      // replica corpora above no longer rewrite, so the expensive 100×
      // build is paid once ever); each run then deletes the %7==3
      // victims from a FRESH filesystem copy of the built state,
      // because delete mutates — a re-delete of already-deleted
      // victims would measure the idempotent no-op, not the masking +
      // wins rewrite + un-crossing repair + cold closure this curve
      // guards. Victim count rides beside the times as n_rows (it
      // grows ~10× per decade with the replica corpus). The 100× point
      // (added r18, closing the verdict's ask) times the DELETE ALONE
      // against the pre-staged state — the r17 exclusion conflated the
      // output-bound pair-store BUILD with the delete; with the build
      // excluded the remaining 100×-sized term is the cold closure
      // over the live pair graph, which IS part of the delete's
      // contract and belongs in the curve. One timed run at 100× (the
      // state copy per run is GB-scale; a single run bounds the point
      // honestly, the source_overlap single-sample precedent).
      def copyDir(src: java.io.File, dst: java.io.File): Unit =
        if (src.isDirectory) {
          dst.mkdirs()
          Option(src.listFiles()).toSeq.flatten
            .foreach(f => copyDir(f, new java.io.File(dst, f.getName)))
        } else java.nio.file.Files.copy(src.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val pts = docDirs.zipWithIndex.map { case (dir, i) =>
        val media = graft.operators.Multimodal.mediaTable(spark, dir)
          .select(col("media_id"), col("content"))
        val mid = media.agg(expr("percentile(media_id, 0.5)"))
          .head().getDouble(0).toLong
        // keyed by the corpus fingerprint, not just the scale index —
        // a work dir reused across different base corpora would
        // otherwise serve a stale state whose victims don't exist,
        // silently timing the idempotent no-op
        val fp = graft.operators.ArtifactCache.fingerprint(
          new java.io.File(s"$dir/documents.parquet"))
        val stateBase = new java.io.File(s"$work/tdstate$i-$fp")
        // sweep stale states from PREVIOUS base corpora: a fingerprint
        // change abandons the old GB-scale state dir, which nothing
        // would ever read again — unbounded disk debt on the shared
        // measurement box otherwise
        Option(new java.io.File(work).listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith(s"tdstate$i-") &&
            f.getName != stateBase.getName)
          .foreach(graft.operators.ArtifactCache.deleteRecursively)
        if (!new java.io.File(stateBase, "_BUILT").exists()) {
          graft.operators.ArtifactCache.deleteRecursively(stateBase)
          graft.operators.MediaGroupsInc.ingest(spark, stateBase.getPath,
            media.filter(col("media_id") < mid))
          graft.operators.MediaGroupsInc.ingest(spark, stateBase.getPath,
            media.filter(col("media_id") >= mid))
          new java.io.File(stateBase, "_BUILT").createNewFile()
        }
        // two victim rules against the SAME pre-staged state, since
        // r19's victim-scoped re-closure makes delete cost ∝ victim
        // COMPONENTS: the %7==3 flood hits most components (a group of
        // size g is victim-free with probability (6/7)^g — a
        // worst-case sweep, the r17/r18 row, curve comparable across
        // rounds), while %701==3 is the realistic bounded takedown
        // (~0.14% of media) whose components are a sliver of the pair
        // store — the point that evidences the scoped-closure claim
        // directly
        def timeDelete(victims: Seq[Long]): Double = {
          val runsHere = if (i == 2) 1 else Runs
          val times = Seq.fill(runsHere) {
            val st = new java.io.File(s"$work/tdrun")
            graft.operators.ArtifactCache.deleteRecursively(st)
            copyDir(stateBase, st)
            new java.io.File(st, "_BUILT").delete()
            val t0 = System.nanoTime()
            graft.operators.MediaGroupsInc.delete(spark, st.getPath, victims)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          Bench.median(times)
        }
        def victimsOf(m: Int, r: Int): Seq[Long] =
          media.filter(pmod(col("media_id"), lit(m)) === r)
            .select(col("media_id")).collect().map(_.getLong(0)).toSeq
        val flood = victimsOf(7, 3)
        val small = victimsOf(701, 3)
        // adjudication data for the scoped-closure claim: nodes in
        // components containing a victim, vs all nodes. The synthetic
        // replica corpus builds ~10k-member near-clique components, so
        // even a 0.14% victim rule reaches ~all nodes here and the
        // scoped path legitimately degenerates to the cold bound —
        // committed so the row's curve is read against its regime
        def affectedOf(victims: Seq[Long]): (Long, Long) = {
          val lab = graft.operators.MediaGroupsInc
            .currentLabels(spark, stateBase.getPath)
            .select(col("media_id").as("doc_id"), col("group_id"))
          val vg = lab.filter(col("doc_id").isin(victims: _*))
            .select(col("group_id")).distinct()
          (lab.join(vg, Seq("group_id"), "left_semi").count(), lab.count())
        }
        val (afF, tot) = affectedOf(flood)
        val (afS, _) = affectedOf(small)
        (timeDelete(flood), flood.size.toLong,
          timeDelete(small), small.size.toLong, afF, afS, tot)
      }
      tdAffected = Some(
        s""""takedown_affected_nodes":{"flood":${pts.map(_._5).mkString("[", ",", "]")},""" +
        s""""small":${pts.map(_._6).mkString("[", ",", "]")},""" +
        s""""total":${pts.map(_._7).mkString("[", ",", "]")}}""")
      Seq(
        ("media_groups_takedown", pts.map(_._1), Some(pts.map(_._2))),
        ("media_groups_takedown_small", pts.map(_._3), Some(pts.map(_._4))))
    }

    // ---------------- IVF assignment cost vs C: flat O(n·C·d) vs the
    // coarse/fine descent O(n·2√C·d) (Similarity.assignCellsHier), on
    // the 200k corpus — the measured justification the 4096-cell cap
    // needs (VERDICT r10 #6): the flat pass grows linearly in C while
    // the two-level pass stays near-flat, and the agreement column
    // shows how often greedy descent lands in the flat argmax cell.
    graft.functions.VectorFunctions.register(spark)
    val assignJson = {
      val e = Tables.load(spark, emb100xDir, "embeddings")
        .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("emb"))
        .withColumn("nrm", graft.functions.VectorFunctions.l2Norm(col("emb")))
        .persist()
      e.count()
      val n = e.count()
      val points = Seq(512, 1024, 2048, 4096).map { c =>
        // force ~c seeds (the engine's √n policy would cap at √200k ≈
        // 448 and flatten the sweep): same hash-stride selection, denser
        val stride = math.max(1L, math.round(n.toDouble / c))
        val seeds = e.filter(pmod(xxhash64(col("vec_id")), lit(stride)) === 0)
          .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"),
            col("nrm").as("cent_nrm"))
        val cells = Similarity.collectCells(
          Similarity.kmeansCentroids(e, seeds, 1))
        val h = Similarity.hierIndex(cells)
        val flatT = timed(() => Similarity.assignCells(e, cells)
          .select(col("vec_id"), col("cent_id")))
        val hierT = timed(() => Similarity.assignCellsHier(e, h)
          .select(col("vec_id"), col("cent_id")))
        val agree = Similarity.assignCells(e, cells).select(col("vec_id"), col("cent_id"))
          .join(Similarity.assignCellsHier(e, h)
            .select(col("vec_id"), col("cent_id").as("cent_id_h")), Seq("vec_id"))
          .agg(avg((col("cent_id") === col("cent_id_h")).cast("double")))
          .first().getDouble(0)
        (cells.ids.size, flatT, hierT, agree)
      }
      e.unpersist()
      points.map { case (c, f, h, a) =>
        f"""{"cells":$c,"flat_s":$f%.2f,"hier_s":$h%.2f,"agreement":$a%.4f}"""
      }.mkString("[", ",", "]")
    }

    // ---------------- cell-prune keep rate at both scales
    def pruneRate(dir: String): Double = {
      val corpus = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("emb"))
        .withColumn("nrm", graft.functions.VectorFunctions.l2Norm(col("emb")))
      val p = Dedup.cellPrune(corpus, 0.9)
      p.keep.count().toDouble / (p.cells.toDouble * p.cells)
    }
    val keeps = Seq(emb1xDir, emb10xDir, emb100xDir).map(pruneRate)

    val opsJson = rows.map { case (name, ts, counts) =>
      val times = ts.map(t => f"$t%.2f").mkString("[", ",", "]")
      val nRows = counts.map(ns =>
        s""","n_rows":${ns.mkString("[", ",", "]")}""").getOrElse("")
      f""""$name":{"times":$times,"ratio_per_10x":${math.pow(ts.last / ts.head, 1.0 / (ts.size - 1))}%.2f$nRows}"""
    }.mkString("{", ",", "}")
    val keepJson = keeps.map(k => f"$k%.4f").mkString("[", ",", "]")
    val stealJson = (for {
      (b0, s0, _) <- jiffiesBefore
      (b1, s1, _) <- Bench.cpuJiffies()
      if b1 - b0 + s1 - s0 > 0
    } yield f"${100.0 * (s1 - s0) / ((b1 - b0) + (s1 - s0)).toDouble}%.1f")
      .getOrElse("null")
    println(f"""{"metric":"scale_growth","runs":$Runs,"scales":"1x,10x,100x","ops":$opsJson,"cellpair_keep_rates":$keepJson,"assignment_200k":$assignJson,"cpu_steal_pct":$stealJson,${tdAffected.map(_ + ",").getOrElse("")}"docs_1x":${d.count()}}""")
    spark.stop()
  }
}
