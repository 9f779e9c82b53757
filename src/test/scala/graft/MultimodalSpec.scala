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

  // --- real pure-JVM codecs (MediaCodecs): actual pixel/sample decode ---

  import graft.operators.MediaCodecs
  import graft.operators.MediaCodecs.{JvmDecoder, Ppm, PpmImage, Wav, WavAudio}

  /** Deterministic fixtures, TESTDATA-style: a horizontal R-gradient PPM
    * and a square-wave PCM16 WAV, built from their formulas.
    */
  private def gradientPpm(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = 3 * (y * w + x)
      rgb(o) = (x * 255 / math.max(1, w - 1)).toByte // R ramps 0..255
      rgb(o + 1) = 64.toByte // G constant
      rgb(o + 2) = (y * 255 / math.max(1, h - 1)).toByte // B ramps down rows
    }
    Ppm.encode(PpmImage(w, h, 255, rgb))
  }

  private def squareWav(rate: Int, n: Int, amp: Short): Array[Byte] =
    Wav.encode(WavAudio(rate, 1, Array.tabulate(n)(i => if (i % 2 == 0) amp else (-amp).toShort)))

  test("JVM decoder decodes real PPM pixels distributed over partitions") {
    val payload = gradientPpm(5, 3)
    val media = (0L until 8L).map(i => MediaRecord(i, "image/x-ppm", payload.length.toLong, payload))
    val ds = spark.createDataset(media).repartition(4)
    val got = MultimodalOps.decodeFeatures(ds, JvmDecoder).collect().sortBy(_.doc_id)
    assert(got.length == 8)
    got.foreach { f =>
      assert(f.kind == "image/x-ppm")
      // R mean: ramp 0,63,127,191,255 per row -> mean 127.4; /255
      assert(math.abs(f.f0 - (0 + 63 + 127 + 191 + 255) / 5.0 / 255.0) < 1e-12)
      assert(math.abs(f.f1 - 64.0 / 255.0) < 1e-12) // G constant
      assert(math.abs(f.f3 - 5.0 / 3.0) < 1e-12) // aspect
    }
  }

  test("JVM decoder decodes real WAV samples; header fields survive") {
    val bytes = squareWav(rate = 16000, n = 16000, amp = 16384)
    val f = JvmDecoder.decode(MediaRecord(7L, "audio/wav", bytes.length.toLong, bytes))
    assert(f.kind == "audio/wav")
    assert(math.abs(f.f0 - 16000.0 / 48000.0) < 1e-12)
    assert(math.abs(f.f1 - 0.5) < 1e-12) // |±16384|/32768
    assert(math.abs(f.f2 - 0.5) < 1e-12) // rms of a square wave == |amp|
    assert(math.abs(f.f3 - 1.0) < 1e-12) // 16000 samples at 16 kHz mono
  }

  test("WAV chunk walker skips non-data chunks and rejects malformed payloads") {
    // splice a LIST chunk between fmt and data
    val plain = squareWav(8000, 8, 1000)
    val buf = java.nio.ByteBuffer.allocate(plain.length + 12)
    buf.put(plain, 0, 36)
    buf.put("LIST".getBytes("US-ASCII")).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4)
    buf.put("INFO".getBytes("US-ASCII"))
    buf.put(plain, 36, plain.length - 36)
    val spliced = buf.array()
    assert(Wav.decode(spliced).samples.length == 8)
    intercept[MalformedStateError](Wav.decode("RIFFxxxxNOPE".getBytes))
    intercept[MalformedStateError](Ppm.decode("P6\n2 2\n255\n".getBytes)) // short payload
    intercept[MalformedStateError](
      JvmDecoder.decode(MediaRecord(1L, "x", 3L, Array[Byte](1, 2, 3))))
  }

  test("real resize is nearest-neighbor pixel work, payload to payload") {
    // 4x4 checkerboard: 2x2 blocks of white/black
    val rgb = new Array[Byte](3 * 16)
    for (y <- 0 until 4; x <- 0 until 4) {
      val v = if (((x / 2) + (y / 2)) % 2 == 0) 255.toByte else 0.toByte
      val o = 3 * (y * 4 + x); rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
    }
    val payload = Ppm.encode(PpmImage(4, 4, 255, rgb))
    val ds = spark.createDataset(Seq(MediaRecord(1L, "image/x-ppm", payload.length.toLong, payload)))
    val out = MultimodalOps.resizeImages(ds, 2, 2).collect().head
    assert(out.kind == "image/x-ppm;2x2")
    val img = Ppm.decode(out.data)
    // nearest-neighbor at half scale samples the top-left of each block
    assert(img.pixel(0, 0) == ((255, 255, 255)))
    assert(img.pixel(1, 0) == ((0, 0, 0)))
    assert(img.pixel(0, 1) == ((0, 0, 0)))
    assert(img.pixel(1, 1) == ((255, 255, 255)))
    // and the resized payload is itself decodable by the feature path
    val f = JvmDecoder.decode(out)
    assert(math.abs(f.f0 - 0.5) < 1e-12)
  }

  test("ppm round-trip: encode(decode(x)) == x, comments tolerated") {
    val bytes = gradientPpm(3, 2)
    assert(Ppm.encode(Ppm.decode(bytes)).sameElements(bytes))
    val commented = ("P6\n# a comment line\n3 2\n255\n").getBytes("US-ASCII") ++
      bytes.drop("P6\n3 2\n255\n".length)
    assert(Ppm.decode(commented).rgb.sameElements(Ppm.decode(bytes).rgb))
    val wav = squareWav(44100, 100, 2000)
    assert(Wav.encode(Wav.decode(wav)).sameElements(wav))
    MediaCodecs // touch import
  }

  test("property: PPM and WAV round-trip for arbitrary geometries and samples") {
    import org.scalacheck.Gen
    val rnd = new scala.util.Random(42)
    // images: random w×h up to 17×13, random pixel bytes
    Gen
      .listOfN(40, Gen.zip(Gen.choose(1, 17), Gen.choose(1, 13)))
      .sample
      .get
      .foreach { case (w, h) =>
        val rgb = Array.fill[Byte](3 * w * h)(rnd.nextInt(256).toByte)
        val img = PpmImage(w, h, 255, rgb)
        val back = Ppm.decode(Ppm.encode(img))
        assert(back.width == w && back.height == h && back.rgb.sameElements(rgb))
        // resize to the same box is identity under nearest-neighbor
        val same = Ppm.resize(img, w, h)
        assert(same.rgb.sameElements(rgb), "identity resize must not move pixels")
        // any resize target yields pixels drawn from the source image
        val r2 = Ppm.resize(img, math.max(1, w / 2 + 1), math.max(1, h / 2 + 1))
        assert(r2.rgb.length == 3 * r2.width * r2.height)
      }
    // audio: random rates/channels/sample vectors
    Gen
      .listOfN(40, Gen.zip(Gen.choose(8000, 48000), Gen.choose(1, 2), Gen.choose(1, 300)))
      .sample
      .get
      .foreach { case (rate, ch, n) =>
        val samples = Array.fill[Short]((n * ch).toInt)(rnd.nextInt(65536).toShort)
        val a = WavAudio(rate, ch, samples)
        val back = Wav.decode(Wav.encode(a))
        assert(back.sampleRate == rate && back.channels == ch)
        assert(back.samples.sameElements(samples))
      }
  }

  test("features depend on payload bytes") {
    val r1 = FakeDecoder.decode(MediaRecord(1L, "text/plain", 5L, "hello world a b".getBytes))
    val r2 = FakeDecoder.decode(MediaRecord(1L, "text/plain", 5L, "hello world a c".getBytes))
    assert(r1.f0 != r2.f0)
  }

  test("frame_sample: every 2nd full frame, fingerprint = hash of that byte window") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("frame_sample")(spark, sfDir).cache()
    try {
      // stride-2 coverage: per doc, sampled count = ceil(n_frames / 2),
      // and indices are exactly 0, 2, 4, ...
      val perDoc = out
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), max("frame_idx").as("mx"), min("frame_idx").as("mn"))
        .join(
          Tables.documents(spark, sfDir).select(col("doc_id"), (length(col("text")) / 64).cast("long").as("nf")),
          Seq("doc_id"),
        )
        .collect()
      assert(perDoc.nonEmpty)
      perDoc.foreach { r =>
        val (n, mx, mn, nf) =
          (r.getAs[Long]("n"), r.getAs[Long]("mx"), r.getAs[Long]("mn"), r.getAs[Long]("nf"))
        assert(n == (nf + 1) / 2, s"doc ${r.getAs[Long]("doc_id")}: sampled $n of $nf frames")
        assert(mn == 0L && mx == (n - 1) * 2, "indices must be the 0,2,4,... prefix")
      }
      // the fingerprint really is the frame's own byte window: recompute
      // frame 0 of one doc from the raw text
      val doc0 = Tables.documents(spark, sfDir).filter(col("doc_id") === 0).select("text").head().getString(0)
      graft.functions.GraftFunctions.register(spark)
      val expected = spark
        .sql(s"SELECT graft_poly_hash('${doc0.substring(0, 64)}') AS h")
        .head()
        .getLong(0)
      val got = out.filter(col("doc_id") === 0 && col("frame_idx") === 0).head().getAs[Long]("frame_hash")
      assert(got == expected, "frame 0 hash must equal the hash of bytes [0, 64)")
    } finally out.unpersist()
  }

  test("media_resize: features are the decode features rescaled, metadata tagged") {
    import org.apache.spark.sql.functions._
    val scale = (256L * 256L % 997L) / 997.0
    val resized = SparkEntry
      .queries("media_resize")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    val texts = Tables
      .documents(spark, sfDir)
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(texts.nonEmpty && resized.size == texts.size)
    texts.foreach { case (id, text) =>
      val r = resized(id)
      assert(r.getAs[String]("kind") == "text/plain;256x256")
      assert(r.getAs[Long]("n_bytes") == text.length.toLong, "stub resize keeps n_bytes")
      // media_features rounds its f0 to 3dp; undoing that is lossy, so
      // compare against the raw decode feature recomputed via the stub
      val raw = MultimodalOps.FakeDecoder
        .decode(MediaRecord(id, "text/plain", text.length.toLong, text.getBytes("UTF-8")))
      val expectedF0 = math.floor(raw.f0 * scale * 1000.0 + 0.5) / 1000.0
      assert(r.getAs[Double]("f0") == expectedF0,
        s"doc $id: f0 ${r.getAs[Double]("f0")} != $expectedF0")
    }
  }
}
