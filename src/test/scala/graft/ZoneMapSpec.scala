package graft

import org.apache.spark.sql.functions._

import graft.operators.ZoneMap

class ZoneMapSpec extends SparkSpec {

  test("zone-map pruning is sound on a random layout (no clustering, no lost rows)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("zm-rand").toString
    // hash-scatter ids across files: every file's [min,max] spans ~the
    // whole domain, so pruning admits everything — and must still be exact
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(6, pmod(xxhash64(col("id")), lit(6L)))
    df.write.mode("overwrite").parquet(s"$tmp/t")
    ZoneMap.build(spark, s"$tmp/t", Seq("id"), s"$tmp/zm")

    val got = ZoneMap.prunedScan(spark, s"$tmp/t", s"$tmp/zm", "id", lit(500L), lit(600L))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (500L to 600L), "pruning lost or invented rows")
    val (touched, total) = ZoneMap.skipStats(spark, s"$tmp/zm", "id", lit(500L), lit(600L))
    // AQE may coalesce the shuffle to fewer files — what matters is
    // that a scattered layout admits EVERY file and stays exact
    assert(total >= 2 && touched == total,
      s"scattered layout should admit all files ($touched/$total)")
  }

  test("zone map skips files on a range-clustered layout; scan reads only admitted files") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("zm-sorted").toString
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    df.write.mode("overwrite").parquet(s"$tmp/t")
    ZoneMap.build(spark, s"$tmp/t", Seq("id"), s"$tmp/zm")

    val scan = ZoneMap.prunedScan(spark, s"$tmp/t", s"$tmp/zm", "id", lit(100L), lit(220L))
    val got = scan.select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (100L to 220L))

    val (touched, total) = ZoneMap.skipStats(spark, s"$tmp/zm", "id", lit(100L), lit(220L))
    assert(total == 8, s"expected 8 files, zone map has $total")
    assert(touched < total, s"clustered layout should skip files ($touched/$total)")
    // the DataFrame really plans over only the admitted files
    assert(scan.inputFiles.length == touched,
      s"scan reads ${scan.inputFiles.length} files, zone map admitted $touched")
  }

  test("a range outside every file's envelope yields an empty result, not an error") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("zm-empty").toString
    val df = (1L to 100L).map(i => (i, i.toString)).toDF("id", "v")
    df.write.mode("overwrite").parquet(s"$tmp/t")
    ZoneMap.build(spark, s"$tmp/t", Seq("id"), s"$tmp/zm")
    val scan = ZoneMap.prunedScan(spark, s"$tmp/t", s"$tmp/zm", "id", lit(900L), lit(999L))
    assert(scan.count() == 0)
    assert(scan.columns.toSeq == Seq("id", "v"), "empty result must keep the table schema")
  }
}
