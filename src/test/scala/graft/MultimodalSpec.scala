package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{FakeDecoder, MediaRecord}

/** Multimodal plumbing: binary payload schema, per-partition decode shape,
  * decoder determinism, and the stubbed native codec contract.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media carrier preserves payload bytes and metadata") {
    val media = MultimodalOps.mediaFromDocuments(spark, sfDir).collect()
    assert(media.nonEmpty)
    assert(media.forall(m => m.n_bytes == m.data.length.toLong))
    assert(media.forall(_.kind == "text/plain"))
  }

  test("decode is deterministic and partition-count preserving") {
    val media = MultimodalOps.mediaFromDocuments(spark, sfDir).repartition(7)
    val decoded = MultimodalOps.decodeFeatures(media, FakeDecoder)
    assert(decoded.rdd.getNumPartitions == 7, "mapPartitions must not reshuffle")
    val a = decoded.collect().sortBy(_.doc_id)
    val b = MultimodalOps
      .decodeFeatures(MultimodalOps.mediaFromDocuments(spark, sfDir), FakeDecoder)
      .collect()
      .sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => Seq(f.f0, f.f1, f.f2, f.f3).forall(v => v >= 0.0 && v < 1.0)))
  }

  test("native decoder is an explicit stub") {
    intercept[UnsupportedOperationException] {
      FakeDecoder // touch to keep import
      MultimodalOps.NativeDecoder.decode(MediaRecord(1L, "image/png", 3L, Array[Byte](1, 2, 3)))
    }
  }

  test("frame sampling explodes metadata without touching the payload") {
    import org.apache.spark.sql.functions._
    val media = MultimodalOps.mediaFromDocuments(spark, sfDir).toDF()
    // n_bytes/100 stands in for a frame count derived from metadata
    val frames = MultimodalOps.sampleFrames(media, (col("n_bytes") / 100).cast("int"), step = 1)
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("data#"), "payload column must be pruned from the frame scan")
    val got = frames.collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Int]("frame_idx") >= 0))
  }

  test("resize stub rescales features and tags the metadata") {
    val media = MultimodalOps.mediaFromDocuments(spark, sfDir).limit(10)
    val base = MultimodalOps.decodeFeatures(media, FakeDecoder).collect().sortBy(_.doc_id)
    val resized = MultimodalOps.resizeStub(media, 224, 224).collect().sortBy(_.doc_id)
    resized.zip(base).foreach { case (r, b) =>
      assert(r.kind == "text/plain;224x224")
      val scale = (224L * 224L % 997L) / 997.0
      assert(r.f0 == b.f0 * scale)
    }
  }

  test("features depend on payload bytes") {
    val r1 = FakeDecoder.decode(MediaRecord(1L, "text/plain", 5L, "hello world a b".getBytes))
    val r2 = FakeDecoder.decode(MediaRecord(1L, "text/plain", 5L, "hello world a c".getBytes))
    assert(r1.f0 != r2.f0)
  }
}
