package graft

import org.apache.spark.sql.functions._

import graft.operators.Upsert

class UpsertSpec extends SparkSpec {

  private def snapshot(path: String): Map[Long, (String, Double)] =
    Upsert.load(spark, path)
      .select(col("id"), col("status"), col("amount")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("copy-on-write upsert: merged content equals the relational merge, " +
    "untouched bucket partitions keep their bytes, pure re-apply is a no-op") {
    import spark.implicits._
    val base = (1L to 200L).map(i => (i, "ok", i * 1.5)).toDF("id", "status", "amount")
    val path = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    Upsert.materialize(base, "id", path, buckets = 8)

    // a small batch: update 3 keys, delete 2, insert 2 new ones
    val changes = Seq(
      (5L, "upd", 99.0, "U"), (17L, "upd", 98.0, "U"), (42L, "upd", 97.0, "U"),
      (7L, "", 0.0, "D"), (13L, "", 0.0, "D"),
      (1001L, "new", 1.0, "U"), (1002L, "new", 2.0, "U")
    ).toDF("id", "status", "amount", Upsert.OpCol)

    // bucket dirs the batch does NOT touch must keep their exact files
    val touched = changes
      .withColumn("part_id", pmod(xxhash64(col("id")), lit(8L)))
      .select("part_id").distinct().collect().map(_.getLong(0)).toSet
    val untouchedDirs = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part_id=") &&
        !touched.contains(f.getName.stripPrefix("part_id=").toLong))
    assert(untouchedDirs.nonEmpty, "test needs at least one untouched bucket")
    def files(d: java.io.File) = d.listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> ((f.length, f.lastModified))).toMap
    val before = untouchedDirs.map(d => d.getName -> files(d)).toMap

    Upsert.applyChanges(spark, path, changes, "id", buckets = 8)

    val expected = (1L to 200L).filterNot(Set(5L, 17L, 42L, 7L, 13L))
      .map(i => i -> (("ok", i * 1.5))).toMap ++
      Map(5L -> (("upd", 99.0)), 17L -> (("upd", 98.0)), 42L -> (("upd", 97.0)),
        1001L -> (("new", 1.0)), 1002L -> (("new", 2.0)))
    assert(snapshot(path) == expected)

    val after = untouchedDirs.map(d => d.getName -> files(d)).toMap
    assert(after == before, s"untouched buckets rewritten: $before -> $after")

    // pure upserts (no deletes) re-applied: content identical
    val pure = changes.filter(col(Upsert.OpCol) =!= "D")
    Upsert.applyChanges(spark, path, pure, "id", buckets = 8)
    assert(snapshot(path) == expected, "re-applying the same upserts changed content")
  }

  test("upsert base read prunes to the touched buckets (PartitionFilters)") {
    import spark.implicits._
    val base = (1L to 50L).map(i => (i, "ok", 0.0)).toDF("id", "status", "amount")
    val path = java.nio.file.Files.createTempDirectory("graft-upsert-prune").toString
    Upsert.materialize(base, "id", path, buckets = 8)

    // the same pruned read applyChanges issues internally
    val pruned = Upsert.load(spark, path).filter(col("part_id").isin(0L, 3L))
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("part_id"),
      s"no partition pruning on part_id:\n$scan")
  }

  test("a batch with duplicate keys is rejected (last-writer-wins is upstream's job)") {
    import spark.implicits._
    val base = (1L to 10L).map(i => (i, "ok", 0.0)).toDF("id", "status", "amount")
    val path = java.nio.file.Files.createTempDirectory("graft-upsert-dup").toString
    Upsert.materialize(base, "id", path, buckets = 4)
    val dup = Seq((1L, "a", 1.0, "U"), (1L, "b", 2.0, "U"))
      .toDF("id", "status", "amount", Upsert.OpCol)
    intercept[IllegalArgumentException] {
      Upsert.applyChanges(spark, path, dup, "id", buckets = 4)
    }
  }
}
