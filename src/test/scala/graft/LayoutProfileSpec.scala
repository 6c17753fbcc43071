package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Layout, Profile}

class LayoutProfileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Reference Morton interleave on the driver, bit by bit — the naive
    * O(32) loop the five mask/shift rounds must agree with.
    */
  private def mortonRef(x: Long, y: Long): Long = {
    val xm = x & 0xFFFFFFFFL; val ym = y & 0x7FFFFFFFL
    (0 until 32).foldLeft(0L) { (z, i) =>
      z | ((xm >> i & 1L) << (2 * i)) | ((ym >> i & 1L) << (2 * i + 1))
    }
  }

  test("zValue matches the bitwise reference interleave on corpus + edge values") {
    val got = Layout.zOrderEvents(spark, sf)
      .select(col("x"), col("y"), col("zval")).collect()
    assert(got.length == 1000)
    got.foreach(r => assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1))))
    // edge values through the same expression path
    val edges = Seq((0L, 0L), (0xFFFFFFFFL, 0x7FFFFFFFL), (1L, 0L), (0L, 1L),
      (0xAAAAAAAAL, 0x55555555L))
    import spark.implicits._
    val df = edges.toDF("x", "y").withColumn("z", Layout.zValue(col("x"), col("y")))
    df.collect().foreach(r => assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1))))
    // sign bit stays clear: z orders correctly as a signed long everywhere
    assert(mortonRef(0xFFFFFFFFL, 0x7FFFFFFFL) > 0)
  }

  test("zOrderPruneReport: pruning is sound and skips most buckets") {
    val rep = Layout.zOrderPruneReport(spark, sf).collect()
    assert(rep.map(_.getLong(1)).sum == 1000) // every event in exactly one bucket
    val hit = rep.count(_.getLong(6) == 1L)
    // soundness: every in-box event lives in a bucket marked hits_box=1
    // (follows from min/max bounds, but assert it end-to-end anyway)
    val inBox = Layout.zOrderEvents(spark, sf)
      .filter(col("x").between(3, 9) &&
        col("y").between(1704844800L, 1705276800L)).count()
    val hitRows = rep.filter(_.getLong(6) == 1L).map(_.getLong(1)).sum
    assert(hitRows >= inBox, "buckets marked skippable contain in-box events")
    // effectiveness: the 2-D box query skips well over half the buckets
    assert(hit <= 26, s"z-order should prune most of 64 buckets, touched $hit")
  }

  test("zOrderWrite prunes a 2-D box on real files; 1-D sort does not") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    val xy = Layout.zOrderEvents(spark, sf).select("event_id", "x", "y")
    val zDir = s"$dir/z"; val xDir = s"$dir/x"
    Layout.zOrderWrite(xy, Layout.zValue(col("x"), col("y")), 16, zDir)
    // 1-D baseline: same file count, sorted by x only
    xy.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(xDir)
    def touched(d: String, x1: Long, x2: Long): Long = Layout.filesTouched(
      Layout.fileBoundingBoxes(spark.read.parquet(d), col("x"), col("y")),
      x1, x2, 1704844800L, 1705276800L)
    val zT = touched(zDir, 3, 9)
    // x-sort puts users 3-9 in few files, but any TIME-range query with
    // a wide user range flips the advantage — the 1-D layout stripes
    // time across every file while z-order still prunes it
    val (zTime, xTime) = (touched(zDir, 0, 1500), touched(xDir, 0, 1500))
    // only ~15 distinct users at sf0.001, so the 16-way x-range write
    // produces fewer non-empty files; ALL of them are touched
    val xFiles = spark.read.parquet(xDir).select(input_file_name()).distinct().count()
    assert(zT <= 8, s"z-order touched $zT/16 files for the 2-D box")
    assert(xTime == xFiles, s"x-sort should stripe time across all $xFiles files, got $xTime")
    assert(zTime < 16, s"z-order should skip files on a time-only box, got $zTime")
    // round trip
    assert(spark.read.parquet(zDir).count() == 1000)
  }

  test("compact sizes output file count from byte statistics") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val smallDir = s"$dir/small"; val outDir = s"$dir/out"
    // the small-files problem: 64 tiny parquet files
    Tables.load(spark, sf, "documents").repartition(64).write.parquet(smallDir)
    val small = spark.read.parquet(smallDir)
    val inputBytes = small.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val target = inputBytes / 4 // want ~4 output files
    val n = Layout.compact(small, target, outDir)
    assert(n >= 3 && n <= 5, s"expected ~4 files, planned $n")
    val written = new java.io.File(outDir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(written == n, s"planned $n files, wrote $written")
    // compaction preserves the data exactly
    assert(spark.read.parquet(outDir).except(small).isEmpty &&
      small.except(spark.read.parquet(outDir)).isEmpty)
  }

  test("profileDocuments matches hand-computed stats; approx variant agrees on shape") {
    val d = Tables.load(spark, sf, "documents")
    val rows = Profile.profileDocuments(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("doc_id", "lang", "n_chars", "source"))
    val n = d.count()
    val langs = d.select(countDistinct(col("lang"))).head().getLong(0)
    val p = rows("lang")
    assert(p.getLong(1) == n && p.getLong(2) == 0 && p.getLong(3) == langs)
    val ids = rows("doc_id")
    assert(ids.getLong(3) == n) // doc_id unique
    assert(ids.getString(4) == "0")
    // approx variant: same schema and row set, ndv within 5%
    val approx = Profile.profileDocuments(spark, sf, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx.keySet == rows.keySet)
    approx.foreach { case (c, ndv) =>
      val exactNdv = rows(c).getLong(3)
      assert(math.abs(ndv - exactNdv) <= math.max(1L, (exactNdv * 0.05).toLong),
        s"approx ndv for $c off: $ndv vs $exactNdv")
    }
  }
}
