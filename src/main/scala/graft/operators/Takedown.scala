package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One front door for every delete lifecycle in the engine. Six
  * takedown-capable stores now exist — the IVF vector index, the video
  * frame index, the image chunk index, the audio landmark index, the
  * text shingle store, the media dup-group state, plus the persisted
  * letter-partitioned inverted index — each grown its own entry points
  * and mid-swap guard predicates. A caller implementing "remove this
  * content everywhere" (DMCA / GDPR / opt-out sweeps hit every
  * modality at once) should not have to know six APIs and their subtly
  * different refusal rules; this facade dispatches, and the
  * refuse-matrix spec sweeps every pending-marker combination through
  * it so the NEXT modality cannot quietly diverge.
  *
  * Semantics are exactly the per-family entry points' — no behavior
  * change, a pure dispatcher:
  *  - [[Modality.posting]] stores (video/image/audio/shingles) go
  *    through [[MediaIndexOps.delete]]/[[MediaIndexOps.compact]]:
  *    O(ids) tombstone, immediately invisible to probes, physical
  *    removal deferred;
  *  - [[IvfVectors]] through [[IvfIndex.delete]]/[[IvfIndex.compact]];
  *  - [[MediaGroups]] through [[MediaGroupsInc.delete]] (which IS
  *    delete+repair in one protocol — [[compact]] maps to
  *    [[MediaGroupsInc.compactState]], the state's generation fold);
  *  - [[TextIndex]] through [[IndexStore.delete]], which needs the
  *    victims' CONTENT (the words to unpost), not bare ids — callers
  *    pass the victim docs as (file_id, value) rows; its delete is
  *    already physical, so [[compact]] is a no-op.
  */
object Takedown {

  /** A deletable store family. `sub`/`idCol` are the posting-layout
    * parameters for the [[MediaIndexOps]]-backed modalities; None
    * marks the families with their own protocols. */
  sealed abstract class Modality(val posting: Option[(String, String)])
  /** Video frame index ([[PerceptualHash]]): `frames/kb=…` postings. */
  case object VideoFrames extends Modality(Some(("frames", "video_id")))
  /** Image chunk index ([[PerceptualHash]]): `chunks/kb=…` postings. */
  case object ImageChunks extends Modality(Some(("chunks", "media_id")))
  /** Audio landmark index ([[AudioMatch]]): `landmarks/kb=…` postings. */
  case object AudioLandmarks extends Modality(Some(("landmarks", "track_id")))
  /** Text shingle store ([[Dedup]]): `postings/kb=…`, no keydf. */
  case object TextShingles extends Modality(Some(("postings", "doc_id")))
  /** IVF vector index ([[IvfIndex]]): cell-partitioned `assigned/`. */
  case object IvfVectors extends Modality(None)
  /** Media dup-group state ([[MediaGroupsInc]]). */
  case object MediaGroups extends Modality(None)
  /** Letter-partitioned inverted index ([[IndexStore]]). */
  case object TextIndex extends Modality(None)

  /** Remove `victims` from the store at `path`. For every modality but
    * [[TextIndex]], `victims` is a single-column id frame (named or
    * not — the first column is taken); for [[TextIndex]] it is the
    * victim documents as (file_id, value) lines. Mutation-vs-marker
    * rules are the family's own: posting-store and IVF deletes are
    * O(ids) tombstone appends that are safe to race any pending
    * compaction (the new tombstone is absent from its marker and
    * survives the resume); group-state and text-index deletes resume
    * or refuse per their protocols. PROBES refuse mid-swap everywhere
    * — [[pending]] is the observable. */
  def delete(s: SparkSession, m: Modality, path: String,
      victims: DataFrame): Unit = m match {
    case mod if mod.posting.isDefined =>
      // no pending-marker guard here, BY the family's contract: a
      // delete racing a crashed/in-flight compaction or consolidation
      // is explicitly safe — it appends a tombstone file absent from
      // the marker, which survives the resume for the next compaction.
      // Refusing would wedge a DMCA sweep on an operation the protocol
      // permits. PROBES refuse mid-swap; deletes don't have to.
      MediaIndexOps.delete(s, path, victims, mod.posting.get._2)
    case IvfVectors =>
      IvfIndex.delete(s, path,
        victims.select(col(victims.columns.head).cast("long").as("vec_id")))
    case MediaGroups =>
      // a takedown list is bounded by contract — the collect hands the
      // family its driver-side victim list, not a data plane
      MediaGroupsInc.delete(s, path,
        victims.select(col(victims.columns.head).cast("long"))
          .collect().map(_.getLong(0)).toSeq)
    case TextIndex =>
      require(victims.columns.contains("file_id") &&
          victims.columns.contains("value"),
        "TextIndex victims are the documents to unpost — (file_id, value) " +
          "rows, not bare ids (the delete needs their words)")
      IndexStore.delete(s, path, victims)
    case other =>
      throw new IllegalArgumentException(s"unhandled modality $other")
  }

  /** Physically reclaim tombstoned rows at `path` (and for
    * [[MediaGroups]], fold the state's generation debt). [[TextIndex]]
    * deletes are already physical — no-op. */
  def compact(s: SparkSession, m: Modality, path: String): Unit = m match {
    case mod if mod.posting.isDefined =>
      val (sub, idCol) = mod.posting.get
      MediaIndexOps.compact(s, path, sub, idCol)
    case IvfVectors => IvfIndex.compact(s, path)
    case MediaGroups => MediaGroupsInc.compactState(s, path)
    case TextIndex => ()
    case other =>
      throw new IllegalArgumentException(s"unhandled modality $other")
  }

  /** True while ANY of the modality's maintenance protocols is
    * mid-swap at `path` — the union of the family's own guard
    * predicates, so a sweep over all modalities × all marker kinds has
    * one observable to assert against. */
  def pending(m: Modality, path: String): Boolean = m match {
    case mod if mod.posting.isDefined =>
      val sub = mod.posting.get._1
      MediaIndexOps.pendingApply(path) ||
        MediaIndexOps.pendingConsolidate(path, sub) ||
        new java.io.File(s"$path/keydf/.compact-commit").exists()
    case IvfVectors => false // single-shot compact: no mid-swap marker
    case MediaGroups =>
      MediaGroupsInc.pendingDelete(path) || MediaGroupsInc.pendingCompact(path)
    case TextIndex => IndexStore.pendingMaintenance(path)
    case other =>
      throw new IllegalArgumentException(s"unhandled modality $other")
  }
}
