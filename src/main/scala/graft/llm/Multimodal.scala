package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs batched per partition.
  *
  * The IMAGE path is real: [[PngCodec]] writes genuine PNG bytes and
  * [[ImageDecoder]] parses them back with `javax.imageio` (in the JDK
  * — zero extra dependencies), so width/height/channel/pixel stats
  * come from actual decoded pixel data. The AUDIO path is real the
  * same way: [[WavCodec]] writes genuine RIFF/WAVE containers and
  * [[AudioDecoder]] parses them back with `javax.sound.sampled` (also
  * in the JDK), so channel/rate/duration/amplitude stats come from
  * actual decoded PCM frames. The VIDEO path is real as of round 8:
  * [[AviCodec]] assembles genuine RIFF/AVI containers of Motion-PNG
  * frames and [[VideoDecoder]] walks the chunk tree per the public
  * AVI spec and ImageIO-decodes every frame — Motion-PNG rather than
  * Motion-JPEG because the lossless frame codec keeps the pixel
  * oracle closed-form; a production deploy swaps the per-frame codec
  * body for an FFI H.264 decoder behind the same mapPartitions
  * shape. No stub decoders remain. In all cases the surrounding
  * plumbing — the schema contract, the mapPartitions batch shape,
  * partition sizing, and the columnar metadata path — is real and
  * tested.
  */
object Multimodal {

  /** Canonical name of the media-payload source, stamped into the e4
    * manifest as `encoder_impl` (the Inference.EncoderImpl convention):
    * the decoders are real, the PAYLOADS are synthesized in-sandbox —
    * a deployment reading crawl media swaps the synthesize* producers
    * and this constant with them, making the swap visible in data. */
  val PayloadImpl = "synthetic-png-wav-payloads-v1"

  /** Output schema of the REAL image decode: everything below comes
    * from `javax.imageio` reading actual PNG bytes. */
  val DecodedImageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", LongType, nullable = false),
    StructField("px_max", LongType, nullable = false)
  ))

  /** Deterministic PNG synthesis — a REAL encoder (`ImageIO.write`)
    * over id-derived content, standing in for fetching image bytes
    * from object storage. Grayscale, two vertical bands:
    * `width = 16 + id % 17`, `height = 16 + (3·id + 5) % 13`, the left
    * `width/2` columns hold sample `id % 256` and the rest
    * `(7·id + 13) % 256` — so every decoded statistic (dims, channel
    * count, pixel sum/min/max) has a closed form an external oracle
    * can replay without an image library, while the bytes on the wire
    * are genuine compressed PNG that only a real decoder can read. */
  object PngCodec {
    def imageDims(id: Long): (Int, Int) =
      (16 + Math.floorMod(id, 17L).toInt, 16 + Math.floorMod(3 * id + 5, 13L).toInt)
    def bandValues(id: Long): (Int, Int) =
      (Math.floorMod(id, 256L).toInt, Math.floorMod(7 * id + 13, 256L).toInt)
    def image(id: Long): java.awt.image.BufferedImage = {
      val (w, h) = imageDims(id)
      val (a, b) = bandValues(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, if (x < w / 2) a else b); x += 1 }
        y += 1
      }
      img
    }
    /** One-shot convenience (registry lookup per call — fine on the
      * driver / in specs; the distributed path reuses a writer). */
    def encode(id: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(image(id), "png", bos)
      bos.toByteArray
    }
    /** Per-partition form: `ImageIO.write` takes a synchronized pass
      * through the IIORegistry on EVERY call — 32 executor threads
      * contending on that lock turned a 0.18 ms encode into ~25 ms
      * (measured round 7). One writer per partition skips the registry
      * per image. */
    def encodeWith(writer: javax.imageio.ImageWriter, id: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(mos)
      writer.write(image(id))
      mos.close()
      bos.toByteArray
    }
  }

  /** REAL image decode via `javax.imageio`: parses the PNG container,
    * inflates the pixel data, and reduces the raster to stats. Works
    * on any ImageIO-supported format (PNG/JPEG/GIF/BMP), any band
    * count — nothing here assumes [[PngCodec]]'s synthesis. */
  object ImageDecoder {
    /** One-shot generic decode (any ImageIO format; registry lookup
      * per call — the distributed path reuses a reader). */
    def decode(id: Long, bytes: Array[Byte]): Row = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"media $id: payload is not a decodable image")
      statsRow(id, bytes, img)
    }
    private val PngMagic = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)
    /** Per-partition form (see [[PngCodec.encodeWith]] for why): PNG
      * payloads go through the reused reader; anything else falls back
      * to the generic registry path, so the batch decode stays
      * format-agnostic. */
    def decodeWith(reader: javax.imageio.ImageReader, id: Long, bytes: Array[Byte]): Row =
      if (bytes.length >= 4 && (0 until 4).forall(i => (bytes(i) & 0xff) == PngMagic(i))) {
        val mis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(mis)
        val img = reader.read(0)
        mis.close()
        statsRow(id, bytes, img)
      } else decode(id, bytes)
    private def statsRow(id: Long, bytes: Array[Byte],
                         img: java.awt.image.BufferedImage): Row = {
      val raster = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
      var sum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < bands) {
            val v = raster.getSample(x, y, c)
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Row(id, bytes.length.toLong, w.toLong, h.toLong, bands.toLong,
        sum, mn.toLong, mx.toLong)
    }
  }

  /** Attach a REAL PNG payload column keyed by id — each row carries
    * genuine compressed PNG bytes, encoded per partition. The encode
    * is a CPU-bound narrow stage, so spread it across the parallelism
    * when the input arrives on few splits (a small parquet read lands
    * on 1-2) — the same trap the shingle staging documents; skipped
    * when the input already has enough splits (any real-scale corpus). */
  def synthesizePngPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val ids = graft.ops.Partitions.spreadForCpu(
      df.select(col(idCol).cast("long").as("media_id")))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = ids.rdd.mapPartitions { it =>
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val out = it.map { r =>
        require(!r.isNullAt(0),
          "synthesizePngPayload: media id is NULL — repair ids before the encode")
        val id = r.getLong(0); Row(id, PngCodec.encodeWith(writer, id))
      }
      disposeAfter(out)(writer.dispose())
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Run `cleanup` exactly once — at iterator exhaustion (the common,
    * earliest point) OR at task completion, whichever comes first. The
    * completion listener is the one that fires when a consumer stops
    * pulling early (limit/take, short-circuiting joins) or the task
    * fails; exhaustion alone would leak the per-partition
    * writer/reader native caches until GC in those cases. */
  private def disposeAfter[T](it: Iterator[T])(cleanup: => Unit): Iterator[T] = {
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    def runOnce(): Unit = if (done.compareAndSet(false, true)) cleanup
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => runOnce()))
    new Iterator[T] {
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) runOnce()
        h
      }
      def next(): T = it.next()
    }
  }

  /** Batched per-partition REAL image decode — one reused reader per
    * partition, `javax.imageio` inflating actual pixel data. */
  def decodeImageBatched(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("media_id", "payload").rdd.mapPartitions { it =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      val out = it.map(r =>
        ImageDecoder.decodeWith(reader, r.getLong(0), r.getAs[Array[Byte]](1)))
      disposeAfter(out)(reader.dispose())
    }
    spark.createDataFrame(rdd, DecodedImageSchema)
  }

  /** Output schema of the REAL audio decode: everything below comes
    * from `javax.sound.sampled` parsing genuine RIFF/WAVE bytes and
    * reading the PCM frames back. */
  val DecodedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("pcm_bytes", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("amp_sum", LongType, nullable = false),
    StructField("amp_min", LongType, nullable = false),
    StructField("amp_max", LongType, nullable = false)
  ))

  /** Deterministic WAV synthesis — a REAL encoder
    * (`javax.sound.sampled.AudioSystem.write`) over id-derived PCM,
    * standing in for fetching audio bytes from object storage (the
    * same move [[PngCodec]] makes for images). 16-bit signed
    * little-endian PCM, two amplitude bands: the first `nFrames/2`
    * frames hold sample `a`, the rest `−b`, identical across
    * channels — so every decoded statistic (channel count, rate,
    * frame count, duration, amplitude sum/min/max) has a closed form
    * an external oracle can replay without an audio library, while
    * the bytes on the wire are a genuine RIFF/WAVE container only a
    * real parser can read. */
  object WavCodec {
    def channels(id: Long): Int = 1 + Math.floorMod(id, 2L).toInt
    def sampleRate(id: Long): Int = 8000 * (1 + Math.floorMod(id, 3L).toInt)
    def numFrames(id: Long): Int = 256 + Math.floorMod(5 * id + 7, 128L).toInt
    def bandValues(id: Long): (Int, Int) =
      (Math.floorMod(37 * id + 11, 30000L).toInt, Math.floorMod(53 * id + 29, 30000L).toInt)

    private def pcm(id: Long): Array[Byte] = {
      val ch = channels(id)
      val nf = numFrames(id)
      val (a, b) = bandValues(id)
      val out = new Array[Byte](nf * ch * 2)
      var i = 0
      var off = 0
      while (i < nf) {
        val v = if (i < nf / 2) a else -b
        var c = 0
        while (c < ch) {
          out(off) = (v & 0xff).toByte
          out(off + 1) = ((v >> 8) & 0xff).toByte
          off += 2; c += 1
        }
        i += 1
      }
      out
    }

    /** One-shot convenience (provider lookup per call — fine on the
      * driver / in specs; the distributed path reuses writers). */
    def encode(id: Long): Array[Byte] = {
      import scala.jdk.CollectionConverters._
      encodeWith(java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).asScala.toSeq, id)
    }

    /** Per-partition form: `AudioSystem.write` walks the provider
      * registry on every call (the ImageIO lock-contention lesson,
      * round 7); loading the writer list once per partition via
      * ServiceLoader keeps the hot loop off the shared registry. */
    def encodeWith(writers: Seq[javax.sound.sampled.spi.AudioFileWriter],
                   id: Long): Array[Byte] = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
      val fmt = new AudioFormat(sampleRate(id).toFloat, 16, channels(id),
        true /* signed */, false /* little-endian */)
      val data = pcm(id)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, numFrames(id).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      val w = writers.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais))
        .getOrElse(sys.error("no WAVE AudioFileWriter provider on this JVM"))
      w.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** REAL audio decode via `javax.sound.sampled`: parses the RIFF/WAVE
    * container, streams the PCM frames, and reduces them to amplitude
    * stats. Works on any 16-bit PCM payload a registered
    * AudioFileReader understands — nothing here assumes [[WavCodec]]'s
    * synthesis. */
  object AudioDecoder {
    import javax.sound.sampled.spi.AudioFileReader

    /** Provider list with the RIFF/WAVE readers FIRST. ServiceLoader
      * order tries Aiff, Au, and SoftMidi before Wave; each miss costs
      * a thrown UnsupportedAudioFileException, and the SoftMidi probe
      * is both slow and lock-contended — measured 5.4k rows/s in
      * registry order vs 228k with Wave first (42×), and under 32
      * threads the Midi path inverted scaling entirely (1M-row probe
      * ran BELOW single-thread throughput). Non-WAV payloads still
      * decode: the rest of the registry remains as fallback. */
    def loadReaders(): Seq[AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[AudioFileReader]).asScala.toSeq
        .sortBy(r => if (r.getClass.getSimpleName.startsWith("Wave")) 0 else 1)
    }

    /** One-shot generic decode (registry path). */
    def decode(id: Long, bytes: Array[Byte]): Row =
      decodeWith(loadReaders(), id, bytes)

    /** Shared parse step: container → (channels, rate, frames,
      * endianness, raw 16-bit PCM bytes). */
    private def pcm16(readers: Seq[AudioFileReader], id: Long,
                      bytes: Array[Byte]): (Int, Long, Long, Boolean, Array[Byte]) = {
      val ais = readers.view
        .flatMap { r =>
          try Some(r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
          catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
        }
        .headOption
        .getOrElse(javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"media $id: amplitude stats need 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
      val data = ais.readAllBytes()
      ais.close()
      (fmt.getChannels, fmt.getSampleRate.toLong, ais.getFrameLength, fmt.isBigEndian, data)
    }

    @inline private def sample16(data: Array[Byte], off: Int, big: Boolean): Int =
      if (big) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort.toInt
      else ((data(off + 1) << 8) | (data(off) & 0xff)).toShort.toInt

    /** Per-partition form (see [[WavCodec.encodeWith]] for why). */
    def decodeWith(readers: Seq[AudioFileReader], id: Long, bytes: Array[Byte]): Row = {
      val (ch, rate, nFrames, big, data) = pcm16(readers, id, bytes)
      var sum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      var off = 0
      while (off + 1 < data.length) {
        val v = sample16(data, off, big)
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
        off += 2
      }
      Row(id, nFrames * ch * 2L, ch.toLong, rate, nFrames,
        nFrames * 1000L / rate, sum, mn.toLong, mx.toLong)
    }

    /** Fixed-window energy features: window w covers frames
      * [w·windowFrames, min((w+1)·windowFrames, n_frames)); energy is
      * the exact Σ sample² over every channel in the window. The last
      * window is partial, never padded — n_samples says how much
      * signal backed each row. */
    def energyWindowsWith(readers: Seq[AudioFileReader], id: Long, bytes: Array[Byte],
                          windowFrames: Int): Iterator[Row] = {
      val (ch, _, _, big, data) = pcm16(readers, id, bytes)
      val frameBytes = ch * 2
      val nFrames = data.length / frameBytes
      new Iterator[Row] {
        private var f = 0
        def hasNext: Boolean = f < nFrames
        def next(): Row = {
          val wIdx = (f / windowFrames).toLong
          val end = math.min(f + windowFrames, nFrames)
          var energy = 0L
          var n = 0L
          while (f < end) {
            var off = f * frameBytes
            val stop = off + frameBytes
            while (off < stop) {
              val v = sample16(data, off, big)
              energy += v.toLong * v
              n += 1
              off += 2
            }
            f += 1
          }
          Row(id, wIdx, n, energy)
        }
      }
    }
  }

  /** Attach a REAL WAV payload column keyed by id — genuine RIFF/WAVE
    * containers, encoded per partition (same narrow-stage spreading as
    * the PNG path). */
  def synthesizeWavPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val ids = graft.ops.Partitions.spreadForCpu(
      df.select(col(idCol).cast("long").as("media_id")))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = ids.rdd.mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      val writers = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).asScala.toSeq
      it.map { r =>
        require(!r.isNullAt(0),
          "synthesizeWavPayload: media id is NULL — repair ids before the encode")
        val id = r.getLong(0); Row(id, WavCodec.encodeWith(writers, id))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Batched per-partition REAL audio decode — the [[decodeImageBatched]]
    * shape with `javax.sound.sampled` as the body. */
  def decodeAudioBatched(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("media_id", "payload").rdd.mapPartitions { it =>
      val readers = AudioDecoder.loadReaders()
      it.map(r => AudioDecoder.decodeWith(readers, r.getLong(0), r.getAs[Array[Byte]](1)))
    }
    spark.createDataFrame(rdd, DecodedAudioSchema)
  }

  /** Output schema of the windowed audio-energy features: one row per
    * fixed-length frame window, energy = Σ sample² across all channels
    * in the window (exact integer — the VAD/segmentation signal an
    * audio curation pipeline thresholds on). */
  val AudioWindowSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("window_idx", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("energy", LongType, nullable = false)
  ))

  /** Windowed audio FEATURE EXTRACTION over the real decode — the
    * audio analog of [[sampleFrames]]: each clip's PCM stream is cut
    * into `windowFrames`-frame windows (last window partial) and
    * reduced to exact integer energy. One input row fans out to
    * ceil(n_frames / windowFrames) feature rows inside the same
    * batched mapPartitions pass — decode happens ONCE per clip, not
    * once per window, and nothing shuffles. */
  def audioEnergyWindows(withPayload: DataFrame, windowFrames: Int): DataFrame = {
    require(windowFrames >= 1, "windowFrames must be positive")
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("media_id", "payload").rdd.mapPartitions { it =>
      val readers = AudioDecoder.loadReaders()
      it.flatMap(r =>
        AudioDecoder.energyWindowsWith(readers, r.getLong(0),
          r.getAs[Array[Byte]](1), windowFrames))
    }
    spark.createDataFrame(rdd, AudioWindowSchema)
  }

  /** Output schema of the REAL video decode: container fields from
    * parsing the RIFF/AVI headers, pixel stats from ImageIO-decoding
    * every frame payload. */
  val DecodedVideoSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("fps", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("px_min", LongType, nullable = false),
    StructField("px_max", LongType, nullable = false)
  ))

  /** Deterministic AVI synthesis — a genuine RIFF/AVI container
    * (`hdrl`/`avih`/`strl`/`strh`/`strf` headers + a `movi` list of
    * `00dc` frame chunks) holding Motion-PNG frames: each frame is a
    * real compressed PNG encoded with `ImageIO`, the lossless codec
    * choice that keeps pixel stats closed-form (Motion-JPEG — the
    * common MJPG twin of this layout — would smear the oracle with DCT
    * error). Grayscale two-band frames like [[PngCodec]], but the band
    * values vary PER FRAME, so a decoder that reads only the first
    * frame (or only headers) fails the px oracle. Layout per the
    * public RIFF/AVI spec (msdn AVIMAINHEADER/AVISTREAMHEADER /
    * OpenDML); fourcc `MPNG`. */
  object AviCodec {
    def numFrames(id: Long): Int = 3 + Math.floorMod(id, 4L).toInt
    def fps(id: Long): Int = 5 + Math.floorMod(id, 3L).toInt
    def videoDims(id: Long): (Int, Int) =
      (16 + Math.floorMod(id, 9L).toInt, 16 + Math.floorMod(3 * id + 5, 7L).toInt)
    def frameBands(id: Long, f: Int): (Int, Int) =
      (Math.floorMod(31 * id + 17L * f + 3, 256L).toInt,
        Math.floorMod(53 * id + 29L * f + 7, 256L).toInt)

    def frameImage(id: Long, f: Int): java.awt.image.BufferedImage = {
      val (w, h) = videoDims(id)
      val (a, b) = frameBands(id, f)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, if (x < w / 2) a else b); x += 1 }
        y += 1
      }
      img
    }

    private def u32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def u16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id) ++ u32(data.length.toLong) ++ data ++ pad
    }
    private def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(listType) ++ children)

    /** One-shot convenience (registry lookup per call — fine on the
      * driver / in specs; the distributed path reuses a writer). */
    def encode(id: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val frames = (0 until numFrames(id)).map { f =>
        javax.imageio.ImageIO.write(frameImage(id, f), "png", bos)
        val bytes = bos.toByteArray; bos.reset(); bytes
      }
      assemble(id, frames)
    }

    /** Per-partition form — one PNG [[javax.imageio.ImageWriter]] per
      * partition (the IIORegistry lock-contention lesson, round 7). */
    def encodeWith(writer: javax.imageio.ImageWriter, id: Long): Array[Byte] = {
      val frames = (0 until numFrames(id)).map { f =>
        val bos = new java.io.ByteArrayOutputStream()
        val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(mos)
        writer.write(frameImage(id, f))
        mos.close()
        bos.toByteArray
      }
      assemble(id, frames)
    }

    private def assemble(id: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
      val (w, h) = videoDims(id)
      val nf = frames.length
      val maxFrame = frames.map(_.length).max
      val avih = u32(1000000L / fps(id)) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++
        u32(nf.toLong) ++ u32(0L) ++ u32(1L) ++ u32(maxFrame.toLong) ++
        u32(w.toLong) ++ u32(h.toLong) ++ u32(0L) ++ u32(0L) ++ u32(0L) ++ u32(0L)
      val strh = fcc("vids") ++ fcc("MPNG") ++ u32(0L) ++ u16(0) ++ u16(0) ++
        u32(0L) ++ u32(1L) ++ u32(fps(id).toLong) ++ u32(0L) ++ u32(nf.toLong) ++
        u32(maxFrame.toLong) ++ u32(0xffffffffL) ++ u32(0L) ++
        u16(0) ++ u16(0) ++ u16(w) ++ u16(h)
      val strf = u32(40L) ++ u32(w.toLong) ++ u32(h.toLong) ++ u16(1) ++ u16(8) ++
        fcc("MPNG") ++ u32((w.toLong * h).toLong) ++ u32(0L) ++ u32(0L) ++
        u32(0L) ++ u32(0L)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi",
        frames.iterator.map(fb => chunk("00dc", fb)).foldLeft(Array.empty[Byte])(_ ++ _))
      chunk("RIFF", fcc("AVI ") ++ hdrl ++ movi)
    }
  }

  /** REAL video decode: walks the RIFF chunk tree per the public AVI
    * spec (bounds-checked — truncated or non-AVI payloads raise named
    * errors, not buffer overruns), reads the container geometry from
    * `avih`, and ImageIO-decodes EVERY `00dc`/`00db` frame payload in
    * the `movi` list for the pixel stats. Nothing here assumes
    * [[AviCodec]]'s synthesis beyond frames being in an
    * ImageIO-readable codec (Motion-PNG or Motion-JPEG both work). */
  object VideoDecoder {
    private def u32(b: Array[Byte], off: Int): Long = {
      require(off + 4 <= b.length, s"truncated container at offset $off")
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    }
    private def fcc(b: Array[Byte], off: Int): String = {
      require(off + 4 <= b.length, s"truncated container at offset $off")
      new String(b, off, 4, "US-ASCII")
    }

    private final case class Parsed(
      microSecPerFrame: Long, totalFrames: Long, width: Long, height: Long,
      framePayloads: Vector[Array[Byte]])

    /** Iterative chunk walk over one chunk sequence `[off, end)`. */
    private def walk(b: Array[Byte], off0: Int, end: Int, st: Parsed): Parsed = {
      var off = off0
      var s = st
      while (off + 8 <= end) {
        val id = fcc(b, off)
        val sz = u32(b, off + 4).toInt
        val dataOff = off + 8
        require(sz >= 0 && dataOff + sz <= end,
          s"chunk '$id' at offset $off overruns the container")
        id match {
          case "LIST" =>
            val listType = fcc(b, dataOff)
            // hdrl carries the headers, movi the frames; other lists
            // (odml, INFO) are skipped whole
            if (listType == "hdrl" || listType == "strl" || listType == "movi")
              s = walk(b, dataOff + 4, dataOff + sz, s)
          case "avih" =>
            s = s.copy(microSecPerFrame = u32(b, dataOff),
              totalFrames = u32(b, dataOff + 16),
              width = u32(b, dataOff + 32), height = u32(b, dataOff + 36))
          case c if c.length == 4 && c(0).isDigit && c(1).isDigit &&
            (c.endsWith("dc") || c.endsWith("db")) =>
            s = s.copy(framePayloads =
              s.framePayloads :+ java.util.Arrays.copyOfRange(b, dataOff, dataOff + sz))
          case _ => () // strh/strf/idx1/JUNK — not needed for stats
        }
        off = dataOff + sz + (sz % 2) // chunks are word-aligned
      }
      s
    }

    /** One-shot generic decode (registry-path ImageIO per frame). */
    def decode(id: Long, bytes: Array[Byte]): Row = decodeWith(None, id, bytes)

    /** Per-partition form: PNG frames go through the reused reader
      * (see [[PngCodec.encodeWith]] for why). */
    def decodeWith(reader: Option[javax.imageio.ImageReader], id: Long,
                   bytes: Array[Byte]): Row = {
      require(bytes.length >= 12 && fcc(bytes, 0) == "RIFF" && fcc(bytes, 8) == "AVI ",
        s"media $id: payload is not a RIFF/AVI container")
      val parsed = walk(bytes, 12, math.min(bytes.length, 8 + u32(bytes, 4).toInt),
        Parsed(0L, 0L, 0L, 0L, Vector.empty))
      require(parsed.framePayloads.nonEmpty, s"media $id: no frame chunks in movi list")
      var sum = 0L
      var mn = Int.MaxValue
      var mx = Int.MinValue
      parsed.framePayloads.foreach { fb =>
        val img = reader match {
          case Some(rd) =>
            val mis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(fb))
            rd.setInput(mis)
            val i = rd.read(0)
            mis.close()
            i
          case None =>
            val i = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
            require(i != null, s"media $id: frame payload is not a decodable image")
            i
        }
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < bands) {
              val v = raster.getSample(x, y, c)
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
              c += 1
            }
            x += 1
          }
          y += 1
        }
      }
      val fps = if (parsed.microSecPerFrame > 0) 1000000L / parsed.microSecPerFrame else 0L
      Row(id, parsed.framePayloads.length.toLong, parsed.width, parsed.height, fps,
        parsed.framePayloads.length * parsed.microSecPerFrame / 1000L,
        sum, mn.toLong, mx.toLong)
    }
  }

  /** Attach a REAL AVI payload column keyed by id — genuine RIFF/AVI
    * containers with Motion-PNG frames, encoded per partition. */
  def synthesizeAviPayload(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val ids = graft.ops.Partitions.spreadForCpu(
      df.select(col(idCol).cast("long").as("media_id")))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = ids.rdd.mapPartitions { it =>
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      disposeAfter(it.map { r =>
        require(!r.isNullAt(0),
          "synthesizeAviPayload: media id is NULL — repair ids before the encode")
        val id = r.getLong(0); Row(id, AviCodec.encodeWith(writer, id))
      })(writer.dispose())
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Batched per-partition REAL video decode — the
    * [[decodeImageBatched]] shape with the RIFF walker +
    * per-frame ImageIO as the body. */
  def decodeVideoBatched(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload.select("media_id", "payload").rdd.mapPartitions { it =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      disposeAfter(it.map(r =>
        VideoDecoder.decodeWith(Some(reader), r.getLong(0), r.getAs[Array[Byte]](1))
      ))(reader.dispose())
    }
    spark.createDataFrame(rdd, DecodedVideoSchema)
  }

  /** Pixel-level features from the real decode: pixel count, exact
    * min/max, and mean luminance in exact milli-units (integer
    * floor-division — engine-replayable, no float rounding). */
  def pixelFeatures(decodedImage: DataFrame): DataFrame =
    decodedImage.select(
      col("media_id"),
      (col("width") * col("height")).as("n_px"),
      col("px_min"), col("px_max"),
      expr("px_sum * 1000 DIV (width * height)").as("mean_milli"))

  /** Frame-sampling over the REAL decode: one row per sampled frame
    * index (every `stride`-th frame of the container's actual frame
    * count) — the explode pattern a video pipeline uses to cut
    * training frames, kept fully columnar after the decode. */
  def sampleFrames(decodedVideo: Dataset[Row], stride: Int): DataFrame =
    decodedVideo
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(stride.toLong))))
      .select("media_id", "n_frames", "frame_idx")

  /** Resize planning: fit-within (targetW, targetH) preserving aspect
    * ratio. The DIMENSION math is the operator (it decides batch
    * shapes and memory downstream); the pixel resample itself belongs
    * in the decode body. Pure integer arithmetic — `tw·h ≤ th·w`
    * picks the binding axis and the other dimension scales by an exact
    * integer floor-division, so any engine replays it bit-for-bit
    * (double-based scale factors differ in the last ulp). */
  def planResize(decoded: Dataset[Row], targetW: Long, targetH: Long): DataFrame =
    decoded
      .withColumn("dst_w",
        when(col("width") * targetH <= col("height") * targetW,
          expr(s"(width * $targetH) DIV height"))
          .otherwise(targetW))
      .withColumn("dst_h",
        when(col("width") * targetH <= col("height") * targetW, targetH)
          .otherwise(expr(s"(height * $targetW) DIV width")))
      .select(col("media_id"), col("width").as("src_w"), col("height").as("src_h"),
        col("dst_w"), col("dst_h"))

}
