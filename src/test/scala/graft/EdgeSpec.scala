package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.AsOfJoin
import graft.sources.DocumentCorpus

class EdgeSpec extends SparkSpec {

  test("file URI normalization handles every scheme form and %-escapes") {
    import spark.implicits._
    val got = Seq(
      "file:///a/b c.txt",       // triple-slash + encoded space would arrive as %20
      "file:///a/b%20c.txt",
      "file:/a/plain.txt",
      "file://localhost/a/x.txt",
      "file:///a/b+c.txt")       // literal '+' is legal in URI paths; must survive
      .toDF("u").select(DocumentCorpus.normalizeFileUri(col("u"))).as[String].collect()
    assert(got.toSeq == Seq("/a/b c.txt", "/a/b c.txt", "/a/plain.txt", "/a/x.txt", "/a/b+c.txt"))
  }

  test("repetition signals match hand-computed values on a tiny corpus") {
    import spark.implicits._
    // "a a b": counts {a:2, b:1} -> rep = 1 - 2/3 = 0.3333,
    // max_frac = 2/3 = 0.6667,
    // entropy = log2(3) - (2*log2(2) + 1*log2(1))/3 = 1.58496 - 0.66667
    val dir = Files.createTempDirectory("graft-edge-rep").toString
    Seq((1L, "a a b", "en", "src0", 5L), (2L, "x x x x", "en", "src0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextQueries.repetition(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows(1L) == ((3L, 2L, 0.3333, 0.6667, 0.9183)))
    // single repeated token: fully repetitive, zero entropy
    assert(rows(2L) == ((4L, 1L, 0.75, 1.0, 0.0)))
  }

  test("asOf join plans exactly one shuffle") {
    val df = AsOfJoin.purchasesWithLastClick(spark, "/root/testdata/sf0.001")
    // count Exchanges before the final presentation sort (orderBy adds
    // a range exchange; the operator itself must contribute exactly 1)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("watermark drops late events in append-mode windows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-late").toString
    def batch(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1).write.mode("append").parquet(dir)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    // batch 1: events up to 12:00 — watermark advances to 11:00
    batch(Seq(
      (1L, ts("2024-01-01 10:10:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 12:00:00"), 1L, "click", 1.0, "{}")))

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))

    val q = stream.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_test").start()
    try {
      q.processAllAvailable()
      // batch 2: an event at 09:30 — far behind the 11:00 watermark
      batch(Seq((3L, ts("2024-01-01 09:30:00"), 1L, "click", 1.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("late_test").collect()
    // the watermark passed 11:00, so exactly one window (10:00, n=1)
    // was emitted; the late 09:30 event must not have created its
    // 09:00 window (the discriminating check — were eviction broken,
    // a 09:00 row would appear)
    assert(rows.map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet ==
      Set(("2024-01-01 10:00:00.0", 1L)),
      s"unexpected emitted windows: ${rows.mkString(", ")}")
  }
}
