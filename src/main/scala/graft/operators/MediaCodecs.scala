package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import graft.MalformedStateError
import graft.operators.MultimodalOps.{MediaDecoder, MediaFeatures, MediaRecord}

/** Pure-JVM media codecs: real byte-level decoders for two self-describing
  * formats that need no native libraries — binary PPM (P6) images and PCM
  * WAV audio. They make the multimodal path more than plumbing: pixels and
  * samples are actually parsed, features are computed from decoded data,
  * and image resize is real pixel work (nearest-neighbor resample), while
  * [[MultimodalOps.FakeDecoder]] remains the oracle-mirrored stand-in for
  * formats that would need an external codec.
  *
  * Scale shape is identical to any decoder behind [[MediaDecoder]]: decode
  * runs inside `mapPartitions` on the scan partitioning (zero shuffle),
  * payloads never outlive the decode projection, and the fixed-width
  * feature schema keeps downstream aggregation payload-free.
  */
object MediaCodecs {

  // ---------------------------------------------------------------- PPM —

  /** A decoded binary PPM (P6) image: 8-bit RGB interleaved. */
  final case class PpmImage(width: Int, height: Int, maxval: Int, rgb: Array[Byte]) {
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = 3 * (y * width + x)
      ((rgb(o) & 0xff), (rgb(o + 1) & 0xff), (rgb(o + 2) & 0xff))
    }
  }

  object Ppm {

    /** Parse the P6 header (magic, whitespace/comment-separated width,
      * height, maxval, one whitespace byte) then the raw RGB plane.
      */
    def decode(bytes: Array[Byte]): PpmImage = {
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
        throw new MalformedStateError("not a P6 ppm payload")
      var pos = 2
      def skipSeparators(): Unit = {
        var in = true
        while (in && pos < bytes.length) {
          val b = bytes(pos)
          if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
          else in = false
        }
      }
      def token(): Int = {
        skipSeparators()
        val start = pos
        while (pos < bytes.length && !Character.isWhitespace(bytes(pos))) pos += 1
        if (start == pos) throw new MalformedStateError("truncated ppm header")
        new String(bytes, start, pos - start, US_ASCII).toInt
      }
      val (w, h, maxval) = (token(), token(), token())
      pos += 1 // the single whitespace after maxval
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255)
        throw new MalformedStateError(s"unsupported ppm geometry ${w}x$h maxval=$maxval")
      val need = 3 * w * h
      if (bytes.length - pos < need)
        throw new MalformedStateError(s"ppm payload short: ${bytes.length - pos} of $need bytes")
      PpmImage(w, h, maxval, java.util.Arrays.copyOfRange(bytes, pos, pos + need))
    }

    def encode(img: PpmImage): Array[Byte] = {
      val header = s"P6\n${img.width} ${img.height}\n${img.maxval}\n".getBytes(US_ASCII)
      val out = new Array[Byte](header.length + img.rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
      out
    }

    /** Real resize: nearest-neighbor resample of the RGB grid. */
    def resize(img: PpmImage, w: Int, h: Int): PpmImage = {
      require(w > 0 && h > 0, "resize box must be positive")
      val out = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * img.height / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * img.width / w).toInt
          val so = 3 * (sy * img.width + sx)
          val to = 3 * (y * w + x)
          out(to) = img.rgb(so); out(to + 1) = img.rgb(so + 1); out(to + 2) = img.rgb(so + 2)
          x += 1
        }
        y += 1
      }
      PpmImage(w, h, img.maxval, out)
    }

    /** Channel means normalized by maxval — the decoded-feature triple. */
    def channelMeans(img: PpmImage): (Double, Double, Double) = {
      var (r, g, b) = (0L, 0L, 0L)
      var i = 0
      while (i < img.rgb.length) {
        r += img.rgb(i) & 0xff; g += img.rgb(i + 1) & 0xff; b += img.rgb(i + 2) & 0xff
        i += 3
      }
      val n = (img.width.toLong * img.height * img.maxval).toDouble
      (r / n, g / n, b / n)
    }
  }

  // ---------------------------------------------------------------- WAV —

  /** Decoded PCM WAV: 16-bit signed little-endian samples, interleaved. */
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def durationSec: Double =
      samples.length.toDouble / (sampleRate.toLong * channels).toDouble
  }

  object Wav {

    /** Parse RIFF/WAVE: walk chunks, require a PCM 16-bit `fmt `, read
      * `data`. Chunk-walking (not fixed offsets) — real files interleave
      * LIST/fact chunks.
      */
    def decode(bytes: Array[Byte]): WavAudio = {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, US_ASCII)
      }
      if (bytes.length < 12 || fourcc() != "RIFF")
        throw new MalformedStateError("not a RIFF payload")
      buf.getInt() // riff size
      if (fourcc() != "WAVE") throw new MalformedStateError("not a WAVE form")
      var rate = -1
      var channels = -1
      var samples: Array[Short] = null
      while (buf.remaining() >= 8 && samples == null) {
        val id = fourcc()
        val size = buf.getInt()
        if (size < 0 || size > buf.remaining())
          throw new MalformedStateError(s"wav chunk $id overruns payload")
        id match {
          case "fmt " =>
            if (size < 16) throw new MalformedStateError(s"wav fmt chunk too short: $size")
            val fmt = buf.getShort()
            channels = buf.getShort().toInt
            rate = buf.getInt()
            buf.getInt() // byte rate
            buf.getShort() // block align
            val bits = buf.getShort()
            if (fmt != 1 || bits != 16)
              throw new MalformedStateError(s"unsupported wav encoding fmt=$fmt bits=$bits")
            buf.position(buf.position() + (size - 16))
          case "data" =>
            if (rate < 0) throw new MalformedStateError("wav data before fmt")
            val n = size / 2
            val s = new Array[Short](n)
            var i = 0
            while (i < n) { s(i) = buf.getShort(); i += 1 }
            samples = s
          case _ =>
            buf.position(buf.position() + size + (size & 1)) // chunks are word-aligned
        }
      }
      if (samples == null) throw new MalformedStateError("wav has no data chunk")
      WavAudio(rate, channels, samples)
    }

    def encode(a: WavAudio): Array[Byte] = {
      val dataLen = a.samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen).put("WAVE".getBytes(US_ASCII))
      buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      buf.putShort(1).putShort(a.channels.toShort).putInt(a.sampleRate)
      buf.putInt(a.sampleRate * a.channels * 2).putShort((a.channels * 2).toShort).putShort(16)
      buf.put("data".getBytes(US_ASCII)).putInt(dataLen)
      a.samples.foreach(buf.putShort)
      buf.array()
    }

    /** (mean |amplitude|, rms) normalized to [0,1] by full scale. */
    def amplitudeStats(a: WavAudio): (Double, Double) = {
      var sumAbs = 0.0
      var sumSq = 0.0
      var i = 0
      while (i < a.samples.length) {
        val v = a.samples(i).toDouble
        sumAbs += math.abs(v); sumSq += v * v
        i += 1
      }
      val n = math.max(1, a.samples.length).toDouble
      (sumAbs / n / 32768.0, math.sqrt(sumSq / n) / 32768.0)
    }
  }

  // ------------------------------------------------------------ decoder —

  /** The real-codec [[MediaDecoder]]: dispatches on the payload's own magic
    * bytes (not the kind column — content is the truth at ingest), decodes,
    * and derives fixed-width features:
    *   PPM:  f0..f2 = channel means / maxval, f3 = aspect ratio
    *   WAV:  f0 = sample rate / 48000, f1 = mean |amp|, f2 = rms, f3 = secs
    */
  object JvmDecoder extends MediaDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val b = r.data
      if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
        val img = Ppm.decode(b)
        val (mr, mg, mb) = Ppm.channelMeans(img)
        MediaFeatures(r.doc_id, "image/x-ppm", r.n_bytes, mr, mg, mb,
          img.width.toDouble / img.height)
      } else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
        val wav = Wav.decode(b)
        val (meanAbs, rms) = Wav.amplitudeStats(wav)
        MediaFeatures(r.doc_id, "audio/wav", r.n_bytes,
          wav.sampleRate / 48000.0, meanAbs, rms, wav.durationSec)
      } else
        throw new MalformedStateError(s"doc ${r.doc_id}: unrecognized media payload")
    }
  }
}
