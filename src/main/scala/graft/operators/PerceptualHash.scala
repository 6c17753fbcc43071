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
