package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing (north star): media payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per partition over the bytes. The actual codec is STUBBED (this
  * container ships no image/audio libraries) behind [[MediaDecoder]]; the
  * deterministic fake implementation keeps the Spark-side plumbing —
  * schema, partitioning, batch iteration, typed output — fully real and
  * testable, and is arithmetically mirrored by the DuckDB oracle.
  *
  * Scale notes: `mapPartitions` keeps decode zero-shuffle (one pass over
  * the scan partitions); features are fixed-width doubles so downstream
  * joins/aggs never carry the payload bytes. At 100 TB the payload column
  * stays in parquet until the decode projection touches it — column
  * pruning skips it for metadata-only queries.
  */
object MultimodalOps extends QueryModule {

  /** A media payload row: bytes + typed metadata. */
  final case class MediaRecord(doc_id: Long, kind: String, n_bytes: Long, data: Array[Byte])

  /** Fixed-width decoded features. */
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      f0: Double,
      f1: Double,
      f2: Double,
      f3: Double,
  )

  /** Decode interface — a real deployment plugs an image/audio codec in
    * here; everything downstream is codec-agnostic.
    */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** A real codec would decode pixels/samples; unavailable in this
    * container, so it stays unimplemented by design.
    */
  object NativeDecoder extends MediaDecoder {
    def decode(r: MediaRecord): MediaFeatures =
      throw new UnsupportedOperationException(
        "native media codecs are not available in this environment; use FakeDecoder",
      )
  }

  /** Deterministic fake: polynomial hash of four 64-byte chunks, scaled to
    * [0,1) — the same fold the cross-engine text hash uses, so the oracle
    * can restate it in SQL over the source text.
    */
  object FakeDecoder extends MediaDecoder {
    private def chunkHash(bytes: Array[Byte], start: Int, len: Int): Long = {
      var a = 0L
      var i = start
      val end = math.min(bytes.length, start + len)
      while (i < end) { a = (a * 31 + (bytes(i) & 0xffL)) % 1000000007L; i += 1 }
      a
    }
    private def feat(bytes: Array[Byte], k: Int): Double =
      (chunkHash(bytes, 64 * k, 64) % 1000L) / 1000.0
    def decode(r: MediaRecord): MediaFeatures =
      MediaFeatures(
        r.doc_id, r.kind, r.n_bytes,
        feat(r.data, 0), feat(r.data, 1), feat(r.data, 2), feat(r.data, 3),
      )
  }

  /** The decode pipeline: binary-typed Dataset → per-partition decode →
    * typed features. No shuffle; partitioning inherited from the scan.
    */
  def decodeFeatures(media: Dataset[MediaRecord], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decoder.decode))
  }

  /** Testdata carrier: documents.text bytes stand in for media payloads
    * (the corpus is ASCII, so byte offsets == character offsets — which is
    * what lets the oracle mirror the byte math with substr).
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    documents(spark, sfDir)
      .select(
        col("doc_id"),
        lit("text/plain").as("kind"),
        length(col("text")).cast("long").as("n_bytes"),
        encode(col("text"), "UTF-8").as("data"),
      )
      .as[MediaRecord]
  }

  /** Frame sampling: one row per sampled frame index — a pure generator
    * (`explode(sequence(...))`, codegen'd) over the *metadata*; the
    * payload column is untouched (and pruned away entirely) until a
    * decoder extracts the frame bytes. `fps`-style steps become the
    * sequence stride.
    */
  def sampleFrames(media: DataFrame, nFrames: Column, step: Int, carry: Seq[String] = Nil): DataFrame =
    media.select(
      Seq(
        col("doc_id"),
        col("kind"),
        explode(
          when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(step)))
            .otherwise(array().cast("array<int>")), // zero-frame media yields no rows
        ).as("frame_idx"),
      ) ++ carry.map(col): _*,
    )

  /** Real image resize: decode → nearest-neighbor resample → re-encode,
    * payload to payload, inside `mapPartitions` (zero shuffle; the output
    * record is a valid PPM that any downstream decode stage reads again).
    * Pure-JVM pixel work via [[MediaCodecs.Ppm]] — no native libs.
    */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val out = MediaCodecs.Ppm.encode(MediaCodecs.Ppm.resize(MediaCodecs.Ppm.decode(r.data), w, h))
      r.copy(kind = s"${r.kind};${w}x$h", n_bytes = out.length.toLong, data = out)
    })
  }

  /** Resize stub for codec-less formats: the deterministic fake scales the
    * feature chunks so the plumbing (metadata update + feature rescale)
    * is testable. Output metadata carries the target box.
    */
  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val scale = (w.toLong * h.toLong % 997L) / 997.0
    media.mapPartitions(_.map { r =>
      val f = FakeDecoder.decode(r)
      f.copy(
        kind = s"${r.kind};${w}x$h",
        f0 = f.f0 * scale, f1 = f.f1 * scale, f2 = f.f2 * scale, f3 = f.f3 * scale,
      )
    })
  }

  private def chunkSqlDuck(k: Int): String =
    s"""round(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split(substr(text, ${64 * k + 1}, 64), ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, c) -> (a * 31 + c) % 1000000007) % 1000 / 1000.0, 3)""".stripMargin

  private val mediaFeatures = DeclaredQuery(
    "media_features",
    (s, d) => {
      import s.implicits._
      decodeFeatures(mediaFromDocuments(s, d), FakeDecoder)
        .toDF()
        .select(
          col("doc_id"),
          col("kind"),
          col("n_bytes"),
          Disp.roundz(col("f0"), 3).as("f0"),
          Disp.roundz(col("f1"), 3).as("f1"),
          Disp.roundz(col("f2"), 3).as("f2"),
          Disp.roundz(col("f3"), 3).as("f3"),
        )
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id, 'text/plain' AS kind, CAST(length(text) AS BIGINT) AS n_bytes,
                    ${chunkSqlDuck(0)} AS f0, ${chunkSqlDuck(1)} AS f1,
                    ${chunkSqlDuck(2)} AS f2, ${chunkSqlDuck(3)} AS f3
             FROM documents ORDER BY doc_id"""),
  )

  /** Bytes per "frame" in the declared sampling query — a FORMAT constant
    * (a real video codec's frame table supplies true offsets; the fixture
    * treats each 64-byte window as one frame, trailing partial discarded).
    */
  private val FrameBytes = 64

  /** Declared frame sampling + per-frame fingerprint — the multimodal
    * composition a video pipeline runs at ingest: enumerate every 2nd
    * frame from the payload's frame count ([[sampleFrames]], a codegen'd
    * generator over METADATA only) and fingerprint the sampled frame's
    * bytes (the dedup key for frame-level exact dedup). The payload rides
    * the explode as a carried column — one scan, zero shuffle, no
    * re-join against the media table for the bytes.
    *
    * The fingerprint is the shared polynomial fold over the frame's
    * byte window (ASCII fixture ⇒ byte offsets ≡ character offsets,
    * which is what lets DuckDB mirror the binary math with substr — the
    * `media_features` trick).
    *
    * At 100 TB: frame explode fans out arithmetically (n_frames/step
    * rows per doc) but each row is (ids + one 64-byte hash) — the
    * payload itself is never duplicated across output rows; everything
    * is scan-local until the presentation sort.
    */
  private val frameSample = DeclaredQuery(
    "frame_sample",
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val media = mediaFromDocuments(s, d)
        .toDF()
        .withColumn("n_frames", (col("n_bytes") / FrameBytes).cast("int"))
      sampleFrames(media, col("n_frames"), 2, carry = Seq("data"))
        .select(
          col("doc_id"),
          col("kind"),
          col("frame_idx").cast("long").as("frame_idx"),
          expr(
            s"graft_poly_hash(decode(substring(data, frame_idx * $FrameBytes + 1, $FrameBytes), 'UTF-8'))",
          ).as("frame_hash"),
        )
        .orderBy("doc_id", "frame_idx")
    },
    Some(s"""WITH m AS (SELECT doc_id, 'text/plain' AS kind, text,
                               CAST(length(text) // $FrameBytes AS BIGINT) AS nf
                        FROM documents),
             f AS (SELECT doc_id, kind, unnest(range(0, nf, 2)) AS frame_idx, text
                   FROM m WHERE nf > 0)
             SELECT doc_id, kind, CAST(frame_idx AS BIGINT) AS frame_idx,
                    list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(
                        string_split(substr(text, CAST(frame_idx * $FrameBytes + 1 AS INTEGER), $FrameBytes), ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 1000000007) AS frame_hash
             FROM f ORDER BY doc_id, frame_idx"""),
  )

  /** Declared resize: the stub-resize path ([[resizeStub]], the
    * codec-less plumbing the real [[resizeImages]] PPM path shares its
    * shape with) run through the SAME mapPartitions pipeline as
    * `media_features`, target box 256×256. The stub's feature rescale is
    * two exact double ops (chunk-hash/1000 × (w·h mod 997)/997 — both
    * factors and the product are the identical IEEE ops the oracle
    * restates), displayed via the shared floor(x·10³ + 0.5)/10³ text.
    * Metadata (kind tag, target box) updates ride the same record.
    *
    * At 100 TB: identical cost class to `media_features` — per-partition
    * payload work, zero shuffle, metadata-only columns never touch the
    * payload bytes.
    */
  private val mediaResize = DeclaredQuery(
    "media_resize",
    (s, d) => {
      import s.implicits._
      resizeStub(mediaFromDocuments(s, d), 256, 256)
        .toDF()
        .select(
          col("doc_id"),
          col("kind"),
          col("n_bytes"),
          expr("CAST(floor(f0 * 1000.0 + 0.5) / 1000.0 AS DOUBLE)").as("f0"),
          expr("CAST(floor(f1 * 1000.0 + 0.5) / 1000.0 AS DOUBLE)").as("f1"),
          expr("CAST(floor(f2 * 1000.0 + 0.5) / 1000.0 AS DOUBLE)").as("f2"),
          expr("CAST(floor(f3 * 1000.0 + 0.5) / 1000.0 AS DOUBLE)").as("f3"),
        )
        .orderBy("doc_id")
    }, {
      def rawChunk(k: Int): String =
        s"""(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |  list_transform(string_split(substr(text, ${64 * k + 1}, 64), ''), c -> CAST(ascii(c) AS BIGINT))),
           |  (a, c) -> (a * 31 + c) % 1000000007) % 1000 / 1000.0)""".stripMargin
      val scale = "((256 * 256) % 997 / 997.0)"
      def f(k: Int): String =
        s"CAST(floor(($scale * ${rawChunk(k)}) * 1000.0 + 0.5) / 1000.0 AS DOUBLE)"
      Some(s"""SELECT doc_id, 'text/plain;256x256' AS kind, CAST(length(text) AS BIGINT) AS n_bytes,
                      ${f(0)} AS f0, ${f(1)} AS f1, ${f(2)} AS f2, ${f(3)} AS f3
               FROM documents ORDER BY doc_id""")
    },
  )

  /** Frame-hash near-duplicate media — the video-dedup shape (content-ID
    * style): two media are near-dups when their SAMPLED frame
    * fingerprints collide; candidates come from an inverted-index
    * equi-join on the frame hash, never a payload comparison. The df cap
    * on hot hashes is the text family's boilerplate rule transplanted —
    * a black frame / station logo appears in everything and carries no
    * identity signal, and uncapped it alone generates O(df²) pairs.
    *
    * Plan: the frame-hash table is the `frame_sample` projection (scan →
    * generate → hash, payload never shuffles — only (doc_id, hash) pairs
    * do); hot-hash anti-join, hash-keyed self-join, pair agg. Identical
    * scale argument to `ngram_jaccard`, one modality over.
    */
  private val MaxFrameDf = 100L
  /** The shared-frame candidate pair frame (da, db, shared, na, nb) —
    * SINGLE definition consumed by the declared `media_near_dup` and
    * the `media_dup_clusters` CC tail, so the pair semantics (sampled
    * frames, hot-hash df cap, doc frame counts) cannot drift.
    */
  private def mediaPairFrame(s: SparkSession, d: String): DataFrame =
    // Substrate-pinned (optimization round 17): the frame-hash + df-capped
    // inverted-index join is the expensive stage of BOTH media consumers
    // (`media_near_dup`, `media_dup_clusters`); one definition, built once
    // per session/dataset — the same amortization the text pair family
    // ("jaccard-pairs") already has. The frame is narrow (5 numeric
    // columns), so the leaf form fits.
    graft.SubstrateCache.substrate(s, d, "media-pairs") {
      mediaPairFrameBuild(s, d)
    }

  private def mediaPairFrameBuild(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val media = mediaFromDocuments(s, d)
      .toDF()
      .withColumn("n_frames", (col("n_bytes") / FrameBytes).cast("int"))
    val fh = sampleFrames(media, col("n_frames"), 2, carry = Seq("data"))
      .select(
        col("doc_id"),
        expr(
          s"graft_poly_hash(decode(substring(data, frame_idx * $FrameBytes + 1, $FrameBytes), 'UTF-8'))",
        ).as("fh"),
      )
    val withN = fh
      .withColumn("na", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val hot = fh.groupBy("fh").agg(count(lit(1)).as("df")).filter(col("df") > MaxFrameDf).select("fh")
    val e = withN.join(hot, Seq("fh"), "left_anti")
    val x = e.select(col("doc_id").as("da"), col("na"), col("fh"))
    val y = e.select(col("doc_id").as("db"), col("na").as("nb"), col("fh").as("fh2"))
    x.join(y, x("fh") === y("fh2") && x("da") < y("db"))
      .groupBy("da", "db", "na", "nb")
      .agg(count(lit(1)).as("shared"))
      .select(col("da"), col("db"), col("shared"), col("na"), col("nb"))
  }

  private val mediaNearDup = DeclaredQuery(
    "media_near_dup",
    (s, d) => mediaPairFrame(s, d).orderBy("da", "db"),
    Some(s"""WITH m AS (SELECT doc_id, text, CAST(length(text) // $FrameBytes AS BIGINT) AS nf
                        FROM documents),
             f AS (SELECT doc_id, unnest(range(0, nf, 2)) AS fi, text FROM m WHERE nf > 0),
             h2 AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(
                        string_split(substr(text, CAST(fi * $FrameBytes + 1 AS INTEGER), $FrameBytes), ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 1000000007) AS fh
                    FROM f),
             wn AS (SELECT doc_id, fh, count(*) OVER (PARTITION BY doc_id) AS na FROM h2),
             hot AS (SELECT fh FROM h2 GROUP BY fh HAVING count(*) > $MaxFrameDf),
             e AS (SELECT wn.doc_id, wn.fh, wn.na FROM wn
                   LEFT JOIN hot ON wn.fh = hot.fh WHERE hot.fh IS NULL)
             SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS shared,
                    CAST(x.na AS BIGINT) AS na, CAST(y.na AS BIGINT) AS nb
             FROM e x JOIN e y ON x.fh = y.fh AND x.doc_id < y.doc_id
             GROUP BY 1, 2, 4, 5
             ORDER BY da, db"""),
  )

  /** Content-ID style media duplicate CLUSTERS — the grouping step over
    * [[mediaPairFrame]] that `media_near_dup`'s pair list stops short
    * of: pairs whose shared sampled-frame count covers ≥ half the
    * smaller doc's frames edge, and connected components (the shared
    * large-star/small-star engine, min-id labels) collapse re-encodes /
    * re-uploads of the same footage into one canonical group. Every
    * media doc with ≥ 1 sampled frame gets a label (singletons label
    * themselves) — the media twin of `dedup_clusters`.
    *
    * Scale: the pair frame is the df-capped inverted-index join (no
    * all-pairs); the CC fixpoint is O(log n) star rounds over
    * pair-cardinality edges — both already certified shapes, composed.
    */
  private val mediaDupClusters = DeclaredQuery(
    "media_dup_clusters",
    (s, d) => {
      val pairs = mediaPairFrame(s, d)
        .filter(expr("shared * 2 >= least(na, nb)"))
        .select(col("da"), col("db"))
      val nodes = mediaFromDocuments(s, d)
        .toDF()
        .withColumn("n_frames", (col("n_bytes") / FrameBytes).cast("int"))
        .filter(col("n_frames") > 0)
        .select(col("doc_id").as("node"))
      DedupOps
        .starContract(nodes, pairs, DedupOps.maxCcRounds(s))
        ._1
        .select(col("node").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE m AS (SELECT doc_id, text, CAST(length(text) // $FrameBytes AS BIGINT) AS nf
                        FROM documents),
             f AS (SELECT doc_id, unnest(range(0, nf, 2)) AS fi, text FROM m WHERE nf > 0),
             h2 AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(
                        string_split(substr(text, CAST(fi * $FrameBytes + 1 AS INTEGER), $FrameBytes), ''),
                        c -> CAST(ascii(c) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 1000000007) AS fh
                    FROM f),
             wn AS (SELECT doc_id, fh, count(*) OVER (PARTITION BY doc_id) AS na FROM h2),
             hot AS (SELECT fh FROM h2 GROUP BY fh HAVING count(*) > $MaxFrameDf),
             e AS (SELECT wn.doc_id, wn.fh, wn.na FROM wn
                   LEFT JOIN hot ON wn.fh = hot.fh WHERE hot.fh IS NULL),
             pr0 AS (SELECT x.doc_id AS da, y.doc_id AS db, count(*) AS shared,
                            CAST(x.na AS BIGINT) AS na, CAST(y.na AS BIGINT) AS nb
                     FROM e x JOIN e y ON x.fh = y.fh AND x.doc_id < y.doc_id
                     GROUP BY 1, 2, 4, 5),
             p AS (SELECT da, db FROM pr0 WHERE shared * 2 >= least(na, nb)),
             edges AS (SELECT da AS src, db AS dst FROM p
                       UNION ALL SELECT db, da FROM p),
             nodes0 AS (SELECT DISTINCT doc_id FROM m WHERE nf > 0),
             reach AS (SELECT doc_id AS node, doc_id AS lbl FROM nodes0
                       UNION
                       SELECT e2.dst AS node, r.lbl
                       FROM reach r JOIN edges e2 ON r.node = e2.src),
             lbl AS (SELECT node AS doc_id, min(lbl) AS cluster_id
                     FROM reach GROUP BY node)
             SELECT doc_id, cluster_id FROM lbl ORDER BY doc_id"""),
  )

  val queries: Seq[DeclaredQuery] =
    Seq(mediaFeatures, frameSample, mediaResize, mediaNearDup, mediaDupClusters)
}
