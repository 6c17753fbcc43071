package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{EventsQueries, Multimodal}
import graft.streaming.EventStream

class MultimodalStreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata") {
    val meta = Multimodal.extractMeta(spark, Multimodal.mediaTable(spark, sf)).collect()
    assert(meta.nonEmpty)
    meta.foreach { m =>
      assert(Seq("image", "audio", "video").contains(m.kind))
      assert(m.n_bytes > 0 && m.width >= 64 && m.height >= 64)
    }
    // deterministic: re-extracting yields identical checksums
    val again = Multimodal.extractMeta(spark, Multimodal.mediaTable(spark, sf))
      .collect().map(m => m.media_id -> m.checksum).toMap
    meta.foreach(m => assert(again(m.media_id) == m.checksum))
  }

  test("frameSample splits payloads losslessly") {
    val media = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.frameSample(spark, media)
    val back = frames.groupBy("media_id").agg(sum("frame_bytes").as("total"))
    val orig = media.select(col("media_id"), length(col("content")).cast("long").as("total"))
    assert(back.except(orig).count() == 0 && orig.except(back).count() == 0)
    assert(frames.agg(max("frame_idx")).collect()(0).getInt(0) <= 3)
  }

  test("byteHistogram features are normalized and find planted near-dup docs") {
    val hist = Multimodal.byteHistogram(spark, Multimodal.mediaTable(spark, sf))
    hist.collect().foreach { r =>
      val sum = r.getSeq[Double](1).sum
      assert(math.abs(sum - 1.0) < 1e-9, s"histogram not normalized: $sum")
    }
    val dups = Multimodal.mediaNearDups(spark, sf, threshold = 0.999)
    assert(dups.count() > 0, "expected near-dup media from planted near-dup texts")
  }

  test("streaming hourly counts equal the batch result") {
    val streaming = EventStream.runToMemory(spark,
      EventStream.hourlyCounts(EventStream.readEvents(spark, sf)), "stream_hourly")
      .select("event_date", "event_hour", "event_type", "n_events", "sum_value")
    val batch = EventsQueries.hourlyCounts(spark, sf)
    assert(streaming.count() == batch.count())
    assert(streaming.except(batch).count() == 0 && batch.except(streaming).count() == 0)
  }

  test("streaming sessionization equals the batch session counts") {
    import spark.implicits._
    val streamed = EventStream.runToMemory(spark,
      EventStream.sessionize(spark, EventStream.readEvents(spark, sf))
        .toDF("user_id", "n_sessions", "n_events"),
      "stream_sessions", OutputMode.Update())
    // last update per user is the final session/event count
    val last = streamed.groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
    val batch = EventsQueries.sessionCounts(spark, sf)
    assert(last.except(batch).count() == 0 && batch.except(last).count() == 0)
  }

  test("streaming dedup equals the batch canonical map") {
    import spark.implicits._
    val streamed = EventStream.runToMemory(spark,
      EventStream.streamingDedup(spark, EventStream.readDocuments(spark, sf))
        .toDF("doc_id", "canonical_id", "is_duplicate"),
      "stream_dedup", OutputMode.Update())
    val batch = graft.operators.Dedup.canonicalMap(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
  }

  test("streaming quality funnel equals the same gates applied in batch") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.streamingQualityFunnel(EventStream.readDocuments(spark, sf)),
      "stream_funnel", OutputMode.Complete())
    // batch reference: identical gate expressions over the static table
    val batch = EventStream.streamingQualityFunnel(
      graft.Tables.load(spark, sf, "documents"))
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)
  }

  test("stateful per-user running counts match batch group counts") {
    import spark.implicits._
    val streamed = EventStream.runToMemory(spark,
      EventStream.userRunningCounts(spark, EventStream.readEvents(spark, sf)).toDF("user_id", "n"),
      "stream_users", OutputMode.Update())
    // last update per user == total batch count
    val last = streamed.groupBy("user_id").agg(max("n").as("n"))
    val batch = graft.Tables.load(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(last.except(batch).count() == 0 && batch.except(last).count() == 0)
  }
}
