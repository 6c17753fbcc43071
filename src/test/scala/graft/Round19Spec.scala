package graft

import org.apache.spark.sql.functions._
import graft.operators.{ArtifactCache, AudioMatch, Dedup, IndexStore, IvfIndex,
  MediaGroupsInc, Multimodal, PerceptualHash, Similarity, Takedown}

/** Round-19 specs: the victim-scoped takedown re-closure — deletes
  * re-run connected components ONLY on components containing a victim
  * or an added-pair endpoint; every other component keeps its labels
  * verbatim — plus the all-victim-flood edge of the group state
  * (footerless wins tree at the next compaction).
  */
class Round19Spec extends SparkSpec {

  private def blk16(c: Char) = c.toString * 16

  private def toMedia(sq: Seq[(Long, String)]) = {
    import spark.implicits._
    sq.toDF("media_id", "text")
      .select(col("media_id"), encode(col("text"), "UTF-8").as("content"))
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def closurePath(): String =
    spark.sparkContext.getLocalProperty(MediaGroupsInc.DelClosureProperty)

  // component X is a chain 1-2-{3,4}: window A pairs (1,2), window B
  // pairs {2,3,4} — deleting 2 SPLITS it (1 drops out pairless, {3,4}
  // survives under a NEW min label 3). Component K = {10,11} never
  // touches a victim and must keep its labels verbatim through the
  // scoped path.
  private val splitCorpus = Seq(
    1L -> (blk16('A') + blk16('u')), 2L -> (blk16('A') + blk16('B')),
    3L -> (blk16('B') + blk16('v')), 4L -> (blk16('B') + blk16('w')),
    10L -> (blk16('C') + blk16('y')), 11L -> (blk16('C') + blk16('z')))

  test("victim-scoped re-closure: deleting a cut vertex splits its " +
    "component exactly (new min labels), untouched components keep " +
    "labels verbatim, and the delete takes the scoped path") {
    val st = java.nio.file.Files.createTempDirectory("graft-r19-split").toString
    val dir = java.nio.file.Files.createTempDirectory("graft-r19-corp").toString
    def oneShotOver(docs: Seq[(Long, String)]): Map[Long, Long] = {
      import spark.implicits._
      docs.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      labelsOf(Multimodal.mediaDupGroups(spark, dir, threshold = 0.0))
    }
    try {
      MediaGroupsInc.ingest(spark, st, toMedia(splitCorpus), threshold = 0.0)
      assert(labelsOf(MediaGroupsInc.currentLabels(spark, st)) ==
        Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
      val got = labelsOf(MediaGroupsInc.delete(spark, st, Seq(2L),
        threshold = 0.0))
      assert(closurePath() == "scoped",
        s"delete with readable previous labels must take the scoped path: " +
          s"got ${closurePath()}")
      // the split: 1 pairless (gone), {3,4} relabel to their new min;
      // K verbatim — exactly the one-shot over the survivors
      val expect = Map(3L -> 3L, 4L -> 3L, 10L -> 10L, 11L -> 10L)
      assert(got == expect, s"got $got")
      assert(got == oneShotOver(splitCorpus.filterNot(_._1 == 2L)),
        "delete ≡ one-shot over survivors")
      // crash inside the swap window (no readable labels generation):
      // the next delete must fall back to the full cold closure and
      // still land on the rebuild answer
      val gen = Option(new java.io.File(s"$st/labels").listFiles()).toSeq
        .flatten.filter(_.getName.startsWith("gen=")).maxBy(_.getName)
      ArtifactCache.deleteRecursively(gen)
      val got2 = labelsOf(MediaGroupsInc.delete(spark, st, Seq(4L),
        threshold = 0.0))
      assert(closurePath() == "cold",
        "a missing labels generation must cold-start the closure")
      assert(got2 == Map(10L -> 10L, 11L -> 10L), s"got $got2")
      assert(got2 == oneShotOver(splitCorpus.filterNot(d =>
        Seq(2L, 4L).contains(d._1))))
    } finally Seq(st, dir).foreach(p =>
      ArtifactCache.deleteRecursively(new java.io.File(p)))
  }

  test("all-victim flood: deleting the entire catalog leaves an empty " +
    "(footerless) wins tree; probes answer empty, compactState still " +
    "prunes hv instead of failing schema inference, audit is clean") {
    import spark.implicits._
    val st = java.nio.file.Files.createTempDirectory("graft-r19-flood").toString
    try {
      MediaGroupsInc.ingest(spark, st, toMedia(splitCorpus), threshold = 0.0)
      val everyone = splitCorpus.map(_._1)
      val got = labelsOf(MediaGroupsInc.delete(spark, st, everyone,
        threshold = 0.0))
      assert(got.isEmpty, s"no survivors can carry a label: $got")
      assert(!ArtifactCache.hasVisibleParquet(new java.io.File(s"$st/wins")),
        "the flood must empty the wins tree")
      // the ADVICE edge: hv-prune-due + a footerless wins tree made
      // compactState fail schema inference before the guard
      assert(new java.io.File(s"$st/.hv-prune-due").exists())
      MediaGroupsInc.compactState(spark, st)
      assert(!new java.io.File(s"$st/.hv-prune-due").exists())
      assert(labelsOf(MediaGroupsInc.currentLabels(spark, st)).isEmpty)
      val audit = Takedown.verifyErased(spark, Takedown.MediaGroups, st,
        everyone.toDF("media_id")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(audit.values.forall(_ == (0L, 0L)),
        s"post-flood post-compaction audit must be all-zero: $audit")
      // the state stays usable: a fresh ingest rebuilds groups
      val revived = labelsOf(MediaGroupsInc.ingest(spark, st,
        toMedia(Seq(100L -> (blk16('D') + blk16('p')),
          101L -> (blk16('D') + blk16('q')))), threshold = 0.0))
      assert(revived == Map(100L -> 100L, 101L -> 100L), s"got $revived")
    } finally ArtifactCache.deleteRecursively(new java.io.File(st))
  }
}
