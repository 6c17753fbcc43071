package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ImageHash, VectorFunctions}

/** Image perceptual near-duplicates: 56-bit dHash
  * ([[graft.functions.ImageHash]] — gradient-sign fingerprint,
  * brightness-invariant by construction) matched under a Hamming
  * radius via EXACT pigeonhole blocking — the image-modality member of
  * the near-dup family next to text MinHash/SimHash and the audio
  * landmark index.
  *
  * Blocking (the [[Dedup]] SimHash discipline): the 56-bit hash splits
  * into [[Chunks]] 14-bit chunks; two hashes within Hamming distance
  * [[MaxHamming]] = Chunks − 1 differ in at most Chunks − 1 bits, so
  * at least ONE chunk is untouched — blocking on chunk equality is
  * provably no-miss (spec: blocked pairs == brute-force Hamming ≤ 3
  * pairs, recall 1.0). Work is ∝ chunk-bucket collisions, never
  * corpus²; a chunk value shared by more than [[MaxChunkDf]] images is
  * structural boilerplate (e.g. the all-zero gradient of blank media)
  * and is dropped from blocking exactly like every other df cap in the
  * family — mirrored in the oracle, which recomputes the same cap.
  *
  * Determinism: pixel sums, comparisons, bit packing, XOR popcounts —
  * all exact integers, so BOTH queries are fully DuckDB-oracled
  * (`q_image_phash` value-exact per image, `q_image_neardups`
  * pair-and-distance exact). At 100 TB the hash is a narrow
  * per-payload projection (one kernel call per row, no shuffle) and
  * the pair join shuffles only (chunk, hash) rows — the same posture
  * as SimHash, which measured 1.7×/decade on the scale curve.
  */
object PerceptualHash {

  val MaxHamming = 3
  val Chunks = 4 // pigeonhole: ≤ 3 flipped bits leave ≥ 1 of 4 chunks intact
  val ChunkBits: Int = ImageHash.HashBits / Chunks // 14
  val MaxChunkDf = 200

  /** Image-kind media with their dHash — `q_image_phash`. */
  def imagePhash(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Multimodal.mediaTable(s, dir)
      .filter(col("kind") === "image" && length(col("content")) > 0)
      .select(col("media_id"), VectorFunctions.dhash56(col("content")).as("phash"))
      .orderBy(col("media_id"))
  }

  /** Near-duplicate image pairs (Hamming ≤ maxHamming over dHash) —
    * `q_image_neardups`. Exact via pigeonhole blocking. */
  def imageNearDups(s: SparkSession, dir: String,
      maxHamming: Int = MaxHamming): DataFrame = {
    require(maxHamming < Chunks,
      s"pigeonhole exactness needs maxHamming < $Chunks chunks")
    val h = imagePhash(s, dir)
    // 4 (chunk_id, chunk_val) rows per image; blocking joins on chunk
    // equality, df-capped per chunk bucket
    val chunks = h.select(col("media_id"), col("phash"),
      explode(expr(s"transform(sequence(0, ${Chunks - 1}), " +
        s"i -> struct(i as cid, (phash div CAST(pow(2, i * $ChunkBits) AS BIGINT))" +
        s" % ${1 << ChunkBits} as cv))")).as("c"))
      .select(col("media_id"), col("phash"),
        col("c.cid").as("cid"), col("c.cv").as("cv"))
    val keep = chunks.groupBy(col("cid"), col("cv"))
      .agg(count(lit(1)).as("cdf"))
      .filter(col("cdf") <= MaxChunkDf)
      .select(col("cid"), col("cv"))
    val kept = chunks.join(broadcast(keep), Seq("cid", "cv"))
    val a = kept.select(col("cid"), col("cv"),
      col("media_id").as("media_a"), col("phash").as("ha"))
    val b = kept.select(col("cid"), col("cv"),
      col("media_id").as("media_b"), col("phash").as("hb"))
    a.join(b, Seq("cid", "cv"))
      .filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("media_a"), col("media_b"))
  }

  // ---- video excerpt matching (frame-hash constellation) -----------

  /** Frames per video for the match relation (a real pipeline samples
    * decoded frames; here [[Multimodal.frameSample]]'s contiguous
    * chunks stand in behind the same decode-stub contract). */
  val VideoFrames = 12

  /** Excerpt geometry: clips are frames [[VClipOff]] … VClipOff +
    * [[VClipLen]] − 1 of every [[VClipMod]]-th video. */
  val VClipOff = 3
  val VClipLen = 6
  val VClipMod = 5

  /** A frame dHash shared by more than this many frames corpus-wide
    * identifies nothing (blank-ish frames) — dropped from matching,
    * the audio MaxKeyDf discipline. */
  val MaxFrameDf = 200

  /** Video near-duplicate excerpt matching — the third modality on the
    * offset-coherent vote design ([[AudioMatch]]'s Shazam criterion
    * replayed for video): per-frame dHashes are the landmark keys, a
    * clip's frames probe the corpus frame table, votes count per
    * (clip, video, frame-offset), and only offset-coherent votes rank
    * a match — a true excerpt aligns every matched frame at ONE
    * offset. Exact oracle: frame chunking, dHash, df cap, votes and
    * the (votes DESC, video ASC, offset ASC) tie-break are all integer
    * arithmetic. Scale shape: frames ∝ corpus (narrow flatMap), the
    * probe side is tiny (clips × VClipLen rows, broadcast), vote
    * counting shuffles only matched frame pairs — df-capped, never
    * corpus².
    */
  def videoMatches(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val frames = Multimodal.frameSample(s,
        Multimodal.mediaTable(s, dir).filter(col("kind") === "video"),
        VideoFrames)
      .select(col("media_id").as("video_id"), col("frame_idx").cast("long").as("f"),
        VectorFunctions.dhash56(col("frame")).as("fh"))
    val keep = frames.groupBy(col("fh")).agg(count(lit(1)).as("fdf"))
      .filter(col("fdf") <= MaxFrameDf).select(col("fh"))
    val idx = frames.join(broadcast(keep), Seq("fh"))
    val clips = frames
      .filter(pmod(col("video_id"), lit(VClipMod)) === 0 &&
        col("f").between(VClipOff, VClipOff + VClipLen - 1))
      .select(col("video_id").as("clip_id"), (col("f") - VClipOff).as("j"),
        col("fh"))
    val votes = idx.join(broadcast(clips), Seq("fh"))
      .groupBy(col("clip_id"), col("video_id"),
        (col("f") - col("j")).as("offset_frames"))
      .agg(count(lit(1)).as("votes"))
    val best = org.apache.spark.sql.expressions.Window.partitionBy(col("clip_id"))
      .orderBy(col("votes").desc, col("video_id").asc, col("offset_frames").asc)
    votes.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("clip_id"), col("video_id"), col("offset_frames"), col("votes"))
      .orderBy(col("clip_id"))
  }

  /** DuckDB restatement of [[videoMatches]]: frame chunk boundaries
    * (size = ⌈len/12⌉, last frame short), per-frame dHash over the
    * frame's OWN balanced cells, df cap, offset-coherent votes, same
    * tie-break. */
  def videoMatchesOracleSql: String = {
    val bits = (0 until ImageHash.HashBits).map { b =>
      val i = (b / 8) * ImageHash.RowCells + (b % 8)
      s"(CASE WHEN px[${i + 1}] > px[${i + 2}] THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH videos AS (
       |  SELECT doc_id AS media_id, text,
       |         GREATEST(CAST(ceil(length(text) / $VideoFrames.0) AS INT), 1) AS fsz
       |  FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0
       |), fbytes AS (
       |  SELECT media_id, CAST((t.i - 1) // fsz AS BIGINT) AS f,
       |         (t.i - 1) % fsz AS jf,
       |         LEAST(fsz, length(text) - ((t.i - 1) // fsz) * fsz) AS flen,
       |         ord(substring(text, CAST(t.i AS INT), 1)) AS v
       |  FROM videos, UNNEST(range(1, length(text) + 1)) AS t(i)
       |), px0 AS (
       |  SELECT media_id, f, CAST((jf * ${ImageHash.Cells}) // flen AS INT) AS cell,
       |         CAST(sum(v) AS BIGINT) AS s
       |  FROM fbytes GROUP BY 1, 2, 3
       |), pxd AS (
       |  SELECT fr.media_id, fr.f, CAST(g.gi AS INT) AS cell, coalesce(p.s, 0) AS s
       |  FROM (SELECT DISTINCT media_id, f FROM px0) fr
       |  CROSS JOIN UNNEST(range(0, ${ImageHash.Cells})) AS g(gi)
       |  LEFT JOIN px0 p ON p.media_id = fr.media_id AND p.f = fr.f AND p.cell = g.gi
       |), frames AS (
       |  SELECT media_id AS video_id, f,
       |         CAST($bits AS BIGINT) AS fh
       |  FROM (SELECT media_id, f, list(s ORDER BY cell) AS px
       |        FROM pxd GROUP BY 1, 2)
       |), keep AS (
       |  SELECT fh FROM (SELECT fh, count(*) AS fdf FROM frames GROUP BY 1)
       |  WHERE fdf <= $MaxFrameDf
       |), idx AS (
       |  SELECT fr.* FROM frames fr JOIN keep k ON k.fh = fr.fh
       |), clips AS (
       |  SELECT video_id AS clip_id, f - $VClipOff AS j, fh
       |  FROM frames
       |  WHERE video_id % $VClipMod = 0
       |    AND f BETWEEN $VClipOff AND ${VClipOff + VClipLen - 1}
       |), votes AS (
       |  SELECT c.clip_id, i.video_id, i.f - c.j AS offset_frames,
       |         CAST(count(*) AS BIGINT) AS votes
       |  FROM clips c JOIN idx i ON i.fh = c.fh
       |  GROUP BY 1, 2, 3
       |), best AS (
       |  SELECT *, row_number() OVER (PARTITION BY clip_id
       |    ORDER BY votes DESC, video_id ASC, offset_frames ASC) AS rn
       |  FROM votes
       |)
       |SELECT clip_id, video_id, offset_frames, votes FROM best
       |WHERE rn = 1 ORDER BY clip_id""".stripMargin
  }

  /** DuckDB restatement of [[imagePhash]]: per-byte unnest → balanced
    * 63-cell sums → adjacent-comparison bits packed into a BIGINT.
    * Byte values via `ord` over the ASCII text, exactly as the Spark
    * kernel reads the encoded payload bytes. */
  def imagePhashOracleSql: String =
    s"""WITH $phashChainSql
       |SELECT media_id, phash FROM ph ORDER BY media_id""".stripMargin

  /** DuckDB restatement of [[imageNearDups]]: the same chunk df cap
    * over the same 14-bit chunks, then brute pair verification —
    * pigeonhole blocking is an EXECUTION strategy, so the oracle can
    * verify pairs directly as long as it reproduces the cap's drops. */
  def imageNearDupsOracleSql: String =
    s"""WITH $phashChainSql, chunks AS (
       |  SELECT media_id, phash, t.i AS cid,
       |         (phash // CAST(pow(2, t.i * $ChunkBits) AS BIGINT)) % ${1 << ChunkBits} AS cv
       |  FROM ph, UNNEST(range(0, $Chunks)) AS t(i)
       |), keep AS (
       |  SELECT cid, cv FROM (
       |    SELECT cid, cv, count(*) AS cdf FROM chunks GROUP BY 1, 2)
       |  WHERE cdf <= $MaxChunkDf
       |), kept AS (
       |  SELECT c.* FROM chunks c JOIN keep k ON k.cid = c.cid AND k.cv = c.cv
       |)
       |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
       |FROM kept a JOIN kept b ON b.cid = a.cid AND b.cv = a.cv
       | AND a.media_id < b.media_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $MaxHamming
       |ORDER BY media_a, media_b""".stripMargin

  /** Shared oracle CTE: text bytes → 63 balanced cell sums → dHash. */
  private def phashChainSql: String = {
    val bits = (0 until ImageHash.HashBits).map { b =>
      val i = (b / 8) * ImageHash.RowCells + (b % 8)
      s"(CASE WHEN px[${i + 1}] > px[${i + 2}] THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""images AS (
       |  SELECT doc_id AS media_id, text FROM documents
       |  WHERE doc_id % 3 = 0 AND length(text) > 0
       |), bytes AS (
       |  SELECT media_id, CAST(((t.i - 1) * ${ImageHash.Cells}) // length(text) AS INT) AS cell,
       |         ord(substring(text, CAST(t.i AS INT), 1)) AS v
       |  FROM images, UNNEST(range(1, length(text) + 1)) AS t(i)
       |), px0 AS (
       |  SELECT media_id, cell, CAST(sum(v) AS BIGINT) AS s
       |  FROM bytes GROUP BY 1, 2
       |), pxd AS (
       |  -- dense 63-slot grid: cells a short payload never touches
       |  -- stay 0, exactly like the kernel's zeroed array
       |  SELECT i.media_id, CAST(g.gi AS INT) AS cell, coalesce(p.s, 0) AS s
       |  FROM images i
       |  CROSS JOIN UNNEST(range(0, ${ImageHash.Cells})) AS g(gi)
       |  LEFT JOIN px0 p ON p.media_id = i.media_id AND p.cell = g.gi
       |), pxl AS (
       |  SELECT media_id, list(s ORDER BY cell) AS px
       |  FROM pxd GROUP BY media_id
       |), ph AS (
       |  SELECT media_id, CAST($bits AS BIGINT) AS phash FROM pxl
       |)""".stripMargin
  }
}
