package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media payload row: binary bytes + typed metadata, the
  * multimodal-column model for a training-data pipeline. */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Decoded features from the payload's own bytes: magic-sniffed
  * format, header-parsed dimensions and frame count, md5 checksum.
  * Rows whose bytes carry no recognizable header (the fixture's
  * "audio" payloads, or any corrupt row at scale) decode to 0×0×1 —
  * the honest unknown-format result a media gate must handle anyway.
  */
final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                               checksum: String, width: Long, height: Long,
                               frames: Long)

/** Multimodal columns: treat image/audio/video as opaque `binary`
  * with typed metadata. Decode / feature-extract is DECLARATIVE
  * ([[Multimodal.decodeFeaturesExpr]]: codegen'd `md5` +
  * bounded-head `regexp_extract` projection — map-only, inside
  * whole-stage codegen); the partition-batched typed form
  * ([[Multimodal.decodeFeatures]], `mapPartitions` in batches of 64 —
  * the mapInPandas batch shape) is kept as the seam where a real
  * codec's per-batch native state would plug in. At scale both are
  * embarrassingly parallel: no shuffle, one pass.
  */
object Multimodal {

  val BatchSize = 64

  /** Attach a binary payload + media_type to each document. The
    * fixture has no real media, so the payload is SYNTHESIZED — but
    * with REAL codec-free headers, so the decode step downstream has
    * genuine bytes to parse rather than placeholders to invent:
    *
    *  - image → binary PPM: `P6\n{w} {h}\n255\n` + body bytes (the
    *    Netpbm header any PPM reader parses),
    *  - video → YUV4MPEG2: `YUV4MPEG2 W{w} H{h} F25:1 XNFRAMES={n}\n`
    *    + body bytes (Y4M's ASCII parameter header; the frame count
    *    rides an X vendor parameter, the spec's extension mechanism),
    *  - audio → NIST SPHERE: `NIST_1A\n{size:>8}\n` + ASCII
    *    `key -i value` lines + `end_head\n` + body bytes (the LDC
    *    speech-corpus container; chosen over WAV/AU because its
    *    header is pure ASCII, which keeps the DuckDB oracle in
    *    VARCHAR arithmetic — DuckDB's md5 cannot digest a BLOB).
    *    The declared size field is the REAL total header length,
    *    which the parser must read to find the body.
    *
    * Planted values derive from the text length (w = 64+len%576,
    * h = 64+(len·7)%416, video frames = 1+len%30, audio rate =
    * 8000+len%36000, channels = 1+len%2), so the DuckDB oracle can
    * state the expected parse results in closed form and the
    * differential check verifies parse(synthesize(v)) == v
    * byte-for-byte. All column work is codegen'd string concat. */
  def withPayload(docs: DataFrame): DataFrame = {
    // null text coalesces to '' (the engine-wide rule this round's
    // oracle hardening established): the payload is then never null,
    // so the decoders downstream need no null branches and the audio
    // magic filter can't silently drop a row the oracle keeps
    val text = coalesce(col("text"), lit(""))
    val len = length(text)
    val w = (lit(64) + len % 576).cast("string")
    val h = (lit(64) + (len * 7) % 416).cast("string")
    val f = (lit(1) + len % 30).cast("string")
    val sr = (lit(8000) + len % 36000).cast("string")
    val ch = (lit(1) + len % 2).cast("string")
    // sample_count: the body's byte length (8-bit mono samples)
    val sc = length(text.cast("binary")).cast("string")
    val sphereBody = concat(
      lit("sample_count -i "), sc,
      lit("\nsample_rate -i "), sr,
      lit("\nchannel_count -i "), ch,
      lit("\nend_head\n"))
    // total header = "NIST_1A\n" (8) + 8-char size + "\n" (9) + body
    val sphereHeader = concat(lit("NIST_1A\n"),
      lpad((length(sphereBody) + 17).cast("string"), 8, " "), lit("\n"),
      sphereBody)
    val mt = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val header = when(mt === "image",
        concat(lit("P6\n"), w, lit(" "), h, lit("\n255\n")))
      .when(mt === "video",
        concat(lit("YUV4MPEG2 W"), w, lit(" H"), h, lit(" F25:1 XNFRAMES="), f, lit("\n")))
      .otherwise(sphereHeader)
    docs.select(
      col("doc_id"),
      mt.as("media_type"),
      concat(header, text).cast("binary").as("payload"))
  }

  /** REAL (non-stub) feature extraction over the opaque payload bytes:
    * length, distinct-byte count, and mean byte value — the
    * codec-free signals (size, entropy proxy, brightness proxy) a
    * media-quality gate can compute on ANY binary column without
    * decoding it. Backed by the native [[graft.functions.ByteStats]]
    * expression — one codegen'd pass over the raw bytes per row (the
    * declarative hex→transform→aggregate form ran its lambdas
    * interpreted, ~13× slower at sf0.1). Oracle-checked bit-for-bit
    * (the DuckDB side computes the same integers from the hex
    * encoding), unlike the stubbed decode whose width/height are
    * placeholders. Map-only: at 100 TB this is one scan.
    * mean_byte_x100 is integer arithmetic — floats never leave. */
  def byteStats(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("media_type"),
        graft.functions.ByteStats.of(col("payload")).as("bs"))
      .select(col("doc_id"), col("media_type"),
        col("bs.payload_len").as("payload_len"),
        col("bs.n_distinct_bytes").as("n_distinct_bytes"),
        col("bs.byte_sum").as("byte_sum"))
      .select(col("doc_id"), col("media_type"), col("payload_len"),
        col("n_distinct_bytes"),
        // explicit null for an empty payload: Spark's div would yield
        // null anyway, but DuckDB errors on //0 — the CASE in the
        // oracle and this when() pin the SAME defined result in both
        when(col("payload_len") === 0, lit(null).cast("long"))
          .otherwise(expr("(byte_sum * 100) div payload_len"))
          .as("mean_byte_x100"))

  /** PPM (Netpbm P6) header: magic, then whitespace-separated ASCII
    * width / height / maxval. Returns (width, height) or None when
    * the bytes aren't a PPM. */
  private val PpmHeader = """(?s)^P6\s+(\d+)\s+(\d+)\s+(\d+)\s.*""".r

  /** YUV4MPEG2 header: one ASCII line of space-separated parameters,
    * each tagged by its leading letter (W width, H height, F rate,
    * X vendor extension). */
  private val Y4mMagic = "YUV4MPEG2 "

  /** REAL header parse over the payload's own bytes — no codec needed
    * for container METADATA, which is what this stage extracts (pixel
    * decode would need the codec libs this container lacks; a
    * production build adds it behind the same signature). Format is
    * sniffed from the magic bytes, not trusted from `media_type`.
    * Only the bounded head of the payload is inspected (headers are
    * ≤ tens of bytes; bodies can be gigabytes at scale). */
  private[graft] def parseHeader(payload: Array[Byte]): (Long, Long, Long) = {
    val head = new String(payload.take(96), java.nio.charset.StandardCharsets.UTF_8)
    // numeral fields are capped at 9 digits BEFORE toLong: a corrupt
    // or adversarial header with an overlong digit run must degrade
    // to the unknown-format result, not throw out of the decode task
    head match {
      case PpmHeader(w, h, _) if w.length <= 9 && h.length <= 9 =>
        (w.toLong, h.toLong, 1L)
      // the parameter line's terminating newline must itself sit
      // inside the sniff window: a line CUT at the window boundary
      // mid-parameter (e.g. XNFRAMES=300 truncated to XNFRAMES=3)
      // would otherwise pass the digit checks and parse a silently
      // wrong value — truncation degrades to unknown, never to a
      // plausible number. (PPM needs no such guard: every accepted
      // field is terminated by whitespace the pattern requires.)
      case _ if head.startsWith(Y4mMagic) && head.indexOf('\n') >= 0 =>
        val params = head.drop(Y4mMagic.length).takeWhile(_ != '\n')
          .split(' ').filter(_.nonEmpty)
        def num(tag: String): Option[Long] =
          params.collectFirst { case p if p.startsWith(tag)
            && p.drop(tag.length).forall(_.isDigit)
            && p.length > tag.length && p.length <= tag.length + 9 =>
            p.drop(tag.length).toLong }
        // frames clamps to >= 1: a zero-frame or corrupt count must
        // not feed sequence(0, -1) in the frame sampler downstream
        (num("W").getOrElse(0L), num("H").getOrElse(0L),
          math.max(1L, num("XNFRAMES=").getOrElse(1L)))
      case _ if head.startsWith("NIST_1A\n") =>
        (0L, 0L, 1L) // recognized audio container: no visual dims
      case _ => (0L, 0L, 1L) // unknown format: no dims, one "frame"
    }
  }

  /** REAL audio-container metadata parse, as a declarative plan: rows
    * whose payload carries the NIST SPHERE magic (sniffed from the
    * BYTES — `media_type` is never trusted) parse their declared
    * header size plus the `sample_rate` / `channel_count` /
    * `sample_count` fields, and derive the body byte count from the
    * size field the way a real SPHERE reader seeks to the data. All
    * codegen'd string/regexp expressions over the casted payload — a
    * map-only scan, no UDF, no shuffle; at 100 TB this parallelizes
    * like any projection. */
  /** The ONE SPHERE header-parse primitive — [[audioMeta]] (metadata)
    * and [[audioPcm]] (sample decode) walk the same container, so the
    * magic gate, the bounded head slice, and every field regex live
    * here once (a header-format fix cannot drift between the two
    * consumers; OpsSpec pins their parity on a shared fixture).
    *
    * Filters to rows carrying the NIST SPHERE magic (sniffed from the
    * BYTES — `media_type` is never trusted) and appends the parsed
    * header columns: `header_bytes` (the declared total header size a
    * real reader seeks by), the standard `-i` integer fields, plus the
    * width fields the 16-bit story needs — `sample_n_bytes`
    * (defaulting 1: the 8-bit corpora this engine grew up on omit it)
    * and `byte_fmt` from the SPHERE `sample_byte_format -s2` string
    * field ("01" little-endian / "10" big-endian; null when absent).
    *
    * Parse hardening is the engine-wide ANSI rule: malformed-header
    * degradation must not depend on the ANSI flag — a plain cast of a
    * corrupt field string returns null only with ANSI off; under
    * Spark 4's ANSI default it would THROW out of the scan. Fields are
    * bounded to matched digit runs (\d{1,9} + a boundary) and the
    * no-match "" is nulled BEFORE the cast, so every cast input is
    * digits-or-null under any ANSI setting. Only a BOUNDED head slice
    * is ever cast to string: a real SPHERE header is <= 1024 bytes by
    * convention, and the body can be gigabytes. */
  private def sphereParsed(media: DataFrame): DataFrame = {
    val s = substring(col("payload"), 1, 1024).cast("string")
    def digitsOrNull(c: Column): Column =
      when(c.rlike("^\\d{1,9}$"), c).cast("long")
    def field(name: String): Column =
      digitsOrNull(regexp_extract(s, name + " -i (\\d{1,9})\n", 1))
    media
      .filter(substring(col("payload"), 1, 8) === lit("NIST_1A\n").cast("binary"))
      .withColumn("header_bytes", digitsOrNull(trim(substring(s, 9, 8))))
      .withColumn("sample_rate", field("sample_rate"))
      .withColumn("channel_count", field("channel_count"))
      .withColumn("sample_count", field("sample_count"))
      .withColumn("sample_n_bytes", coalesce(field("sample_n_bytes"), lit(1L)))
      .withColumn("byte_fmt",
        when(regexp_extract(s, "sample_byte_format -s2 (01|10)\n", 1) === "",
          lit(null).cast("string"))
          .otherwise(regexp_extract(s, "sample_byte_format -s2 (01|10)\n", 1)))
  }

  def audioMeta(media: DataFrame): DataFrame = {
    sphereParsed(media)
      .select(col("doc_id"), col("header_bytes"),
        col("sample_rate"), col("channel_count"), col("sample_count"),
        length(col("payload")).as("n_bytes"))
      // a size-lying header (declared size > the payload it arrived
      // in) must not emit a negative body length: null the row's
      // data_bytes — the honest "header inconsistent" signal, matching
      // the degrade-gracefully rule the other parsers follow
      .withColumn("data_bytes",
        when(col("n_bytes") >= col("header_bytes"),
          col("n_bytes") - col("header_bytes")))
      .select(col("doc_id"), col("header_bytes"), col("sample_rate"),
        col("channel_count"), col("sample_count"), col("data_bytes"))
  }

  /** Planted PCM formulas shared by [[audioPcmPayload]], the spec's
    * ground truth, and (in closed form) the DuckDB oracle — the
    * [[pngDims]]/[[pngChannels]] pattern for audio: frames, channel
    * count, rate, and every body byte derive from doc_id alone, so an
    * engine that genuinely reads the samples out of the container
    * bytes can still be HASH-checked without the oracle parsing a
    * byte. Samples are unsigned 8-bit, channel-interleaved (frame f,
    * channel c at body byte f·ch + c). */
  private[graft] def pcmFrames(docId: Long): Int = (40 + docId % 120).toInt
  private[graft] def pcmChannelCount(docId: Long): Int = (1 + docId % 2).toInt
  private[graft] def pcmRate(docId: Long): Int = (8000 + (docId % 3) * 4000).toInt
  private[graft] def pcmByte(docId: Long, j: Int): Int = ((5 * docId + 3 * j) % 256).toInt

  /** REAL audio payloads through the codec seam: one genuine NIST
    * SPHERE file per document — the ASCII header [[withPayload]]
    * synthesizes (same `NIST_1A` magic, declared total header size,
    * `key -i value` fields, `end_head`), followed by a BODY of raw
    * interleaved 8-bit PCM planted by [[pcmByte]]. Unlike
    * [[withPayload]]'s audio rows (whose body is the document text —
    * metadata-parse fixtures), these bodies are SAMPLES a decoder can
    * be checked against. Runs in the partition-batched typed shape
    * (raw byte assembly is per-row imperative work, the same seam the
    * PNG/JPEG encoders use); map-only at any scale. */
  def audioPcmPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
      it.map { did =>
        val frames = pcmFrames(did)
        val ch = pcmChannelCount(did)
        val body = new Array[Byte](frames * ch)
        var j = 0
        while (j < body.length) {
          body(j) = pcmByte(did, j).toByte
          j += 1
        }
        val fields = s"sample_count -i $frames\nsample_rate -i ${pcmRate(did)}\n" +
          s"channel_count -i $ch\nend_head\n"
        // total header = "NIST_1A\n" (8) + 8-char size + "\n" (9) + fields
        val header = "NIST_1A\n" + ("%8d".format(fields.length + 17)) + "\n" + fields
        MediaRow(did, "audio/sphere",
          header.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body)
      }
    }.toDF()
  }

  /** Planted 16-bit PCM formulas — [[pcmByte]]'s contract at the width
    * real speech corpora use (TIMIT et al.: `sample_n_bytes 2` plus a
    * `sample_byte_format` byte order): frames, channels, byte order,
    * and every SIGNED sample value derive from doc_id alone, so the
    * oracle predicts the per-channel sums in closed form without
    * parsing a container byte. The sample walks the full two's-
    * complement range (mod 65536, shifted) so sign extension and both
    * byte orders are genuinely exercised, not just positive values
    * that would pass under an unsigned-decode bug. */
  private[graft] def pcm16Frames(docId: Long): Int = (30 + docId % 90).toInt
  private[graft] def pcm16ChannelCount(docId: Long): Int = (1 + docId % 2).toInt
  private[graft] def pcm16BigEndian(docId: Long): Boolean = docId % 3 == 0
  private[graft] def pcm16Sample(docId: Long, j: Int): Int =
    (((7 * docId + 11 * j) % 65536) - 32768).toInt

  /** 16-bit sibling of [[audioPcmPayload]]: genuine NIST SPHERE files
    * whose headers declare `sample_n_bytes -i 2` and a
    * `sample_byte_format -s2` byte order ("10" big-endian for every
    * third document, "01" little-endian otherwise — both orders in one
    * corpus), with bodies of interleaved SIGNED 16-bit samples planted
    * by [[pcm16Sample]]. Same partition-batched typed seam, map-only
    * at any scale. */
  def audioPcm16Payload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
      it.map { did =>
        val frames = pcm16Frames(did)
        val ch = pcm16ChannelCount(did)
        val big = pcm16BigEndian(did)
        val body = new Array[Byte](frames * ch * 2)
        var j = 0
        while (j < frames * ch) {
          val v = pcm16Sample(did, j)
          val (b0, b1) = if (big) ((v >> 8).toByte, v.toByte)
                         else (v.toByte, (v >> 8).toByte)
          body(2 * j) = b0
          body(2 * j + 1) = b1
          j += 1
        }
        val fields = s"sample_count -i $frames\nsample_rate -i ${pcmRate(did)}\n" +
          s"channel_count -i $ch\nsample_n_bytes -i 2\n" +
          s"sample_byte_format -s2 ${if (big) "10" else "01"}\nend_head\n"
        // total header = "NIST_1A\n" (8) + 8-char size + "\n" (9) + fields
        val header = "NIST_1A\n" + ("%8d".format(fields.length + 17)) + "\n" + fields
        MediaRow(did, "audio/sphere",
          header.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body)
      }
    }.toDF()
  }

  /** REAL sample decode for the uncompressed audio format — the audio
    * twin of [[decodePixels]]: rows gated on the SPHERE magic (sniffed
    * from bytes, never trusted from `media_type`), the body located by
    * the header's declared size the way a real SPHERE reader seeks,
    * and per-channel sums folded by one codegen'd [[graft.functions
    * .PcmStats]] pass over the interleaved samples. Map-only, no
    * shuffle, no UDF. Only complete frames count (floor(len/ch) — a
    * truncated body degrades to fewer frames, spec-pinned), a
    * zero-frame or channel-less body yields null means (the engine's
    * explicit-null-over-div-by-zero rule), and all outputs are
    * integer-exact ×100-scaled `div`s mirrored verbatim in the
    * oracle. */
  def audioPcm(media: DataFrame): DataFrame = {
    sphereParsed(media)
      // a size-lying header (declared size > payload) must not slice a
      // negative body: gate on consistency, like audioMeta's data_bytes
      .filter(col("header_bytes").isNotNull &&
        length(col("payload")) >= col("header_bytes"))
      .withColumn("body",
        expr("substring(payload, header_bytes + 1, length(payload))"))
      // format routing from the HEADER's own width/order fields:
      // 1 = unsigned 8-bit, 2 = signed 16-bit little-endian ("01"),
      // 3 = signed 16-bit big-endian ("10"). Anything else — a width
      // this decoder doesn't speak, or a 2-byte row that omits its
      // byte order — degrades to fmt 0, which PcmStats folds to zero
      // frames (null means): the honest header-inconsistent result,
      // never a guessed byte order
      .withColumn("fmt",
        when(col("sample_n_bytes") === 1, lit(1))
          .when(col("sample_n_bytes") === 2 && col("byte_fmt") === "01", lit(2))
          .when(col("sample_n_bytes") === 2 && col("byte_fmt") === "10", lit(3))
          .otherwise(lit(0)))
      .select(col("doc_id"), col("sample_rate"), col("channel_count"),
        col("sample_n_bytes"),
        graft.functions.PcmStats.of(col("body"),
          coalesce(col("channel_count"), lit(0L)).cast("int"),
          col("fmt")).as("ps"))
      .select(col("doc_id"), col("sample_rate"), col("channel_count"),
        col("sample_n_bytes"),
        col("ps.n_frames").as("n_frames"),
        col("ps.sum_c0").as("sum_c0"), col("ps.sum_c1").as("sum_c1"))
      .select(col("doc_id"), col("sample_rate"), col("channel_count"),
        col("sample_n_bytes"), col("n_frames"),
        pcmMean(col("sum_c0"), col("n_frames"), lit(1L)).as("mean_c0_x100"),
        when(col("channel_count") >= 2,
          pcmMean(col("sum_c1"), col("n_frames"), lit(1L)))
          .otherwise(lit(null).cast("long")).as("mean_c1_x100"),
        // PcmStats accumulates channels 0 and 1 only, so an overall
        // mean is computable ONLY for ch <= 2: a genuine >= 3-channel
        // container must yield null here, not a silently understated
        // mean over a third of its samples
        when(col("channel_count") <= 2,
          pcmMean(col("sum_c0") + col("sum_c1"), col("n_frames"),
            col("channel_count")))
          .otherwise(lit(null).cast("long")).as("mean_all_x100"))
  }

  /** ×100-scaled integer sample mean; exact `div`, explicit null on a
    * zero-frame body — [[chanMean]]'s shape with a column divisor. */
  private def pcmMean(sum: Column, nFrames: Column, perFrame: Column): Column =
    when(nFrames === 0 || perFrame <= 0, lit(null).cast("long"))
      .otherwise(call_function("div", sum * 100, nFrames * perFrame))

  /** Planted Y4M formulas shared by [[videoPayload]], the spec's
    * ground truth, and (in closed form) the DuckDB oracle — the
    * [[pngChannels]]/[[pcmByte]] pattern for the third modality: dims
    * (even, 4:2:0-legal), frame count, and every plane byte derive
    * from doc_id alone, so an engine that genuinely walks the frame
    * markers and plane offsets can be HASH-checked without the oracle
    * parsing a container byte. */
  private[graft] def y4mDims(docId: Long): (Int, Int) =
    ((8 + 2 * (docId % 5)).toInt, (6 + 2 * (docId % 3)).toInt)
  private[graft] def y4mFrameCount(docId: Long): Int = (2 + docId % 4).toInt
  private[graft] def y4mY(docId: Long, f: Int, i: Int): Int =
    ((3 * docId + 7 * f + i) % 256).toInt
  private[graft] def y4mU(docId: Long, f: Int, j: Int): Int =
    ((2 * docId + 5 * f + 3 * j) % 256).toInt
  private[graft] def y4mV(docId: Long, f: Int, j: Int): Int =
    ((docId + 11 * f + j) % 256).toInt

  /** REAL video payloads through the codec seam — one genuine
    * YUV4MPEG2 stream per document: the ASCII parameter line
    * [[withPayload]] synthesizes (same magic, W/H, the XNFRAMES
    * vendor extension) plus a `C420` colourspace tag, followed by a
    * BODY of `FRAME\n`-marked uncompressed 4:2:0 planes planted by
    * [[y4mY]]/[[y4mU]]/[[y4mV]]. Unlike [[withPayload]]'s video rows
    * (whose body is the document text — metadata-parse fixtures),
    * these bodies are FRAMES a decoder can be checked against — the
    * modality triple (P6/PNG/JPEG pixels, SPHERE samples, Y4M frames)
    * is complete. Partition-batched typed seam, map-only at scale. */
  def videoPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
      val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      it.map { did =>
        val (w, h) = y4mDims(did)
        val nf = y4mFrameCount(did)
        val luma = w * h
        val chroma = (w / 2) * (h / 2)
        val header = s"YUV4MPEG2 W$w H$h F25:1 C420 XNFRAMES=$nf\n"
        val body = new Array[Byte](nf * (marker.length + luma + 2 * chroma))
        var off = 0
        var f = 0
        while (f < nf) {
          System.arraycopy(marker, 0, body, off, marker.length)
          off += marker.length
          var i = 0
          while (i < luma) { body(off) = y4mY(did, f, i).toByte; off += 1; i += 1 }
          var j = 0
          while (j < chroma) { body(off) = y4mU(did, f, j).toByte; off += 1; j += 1 }
          j = 0
          while (j < chroma) { body(off) = y4mV(did, f, j).toByte; off += 1; j += 1 }
          f += 1
        }
        MediaRow(did, "video/y4m",
          header.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body)
      }
    }.toDF()
  }

  /** REAL frame decode for the uncompressed video format — the video
    * twin of [[decodePixels]]/[[audioPcm]]: rows gated on the
    * YUV4MPEG2 magic (sniffed from bytes, never trusted from
    * `media_type`), dims recovered from the parameter line (same
    * hardened \d{1,9} bounds as [[decodeFeaturesExpr]]), the body
    * located after the line's newline at byte precision, and one
    * codegen'd [[graft.functions.Y4mFrameStats]] pass walking the
    * `FRAME\n` markers and 4:2:0 plane offsets — one output row per
    * COMPLETE frame with ×100 integer plane means (a truncated final
    * frame is ignored; a framing error stops the walk; a zero-frame
    * body emits no rows). Map-only, no shuffle, no UDF. */
  def videoPixels(media: DataFrame): DataFrame = {
    val head = substring(col("payload"), 1, 96).cast("string")
    def longOf(c: Column): Column =
      when(c === "", lit(null)).otherwise(c).cast("long")
    val y4mLine = regexp_extract(head, "^(YUV4MPEG2 [^\n]*\n)", 1)
    def y4mNum(tag: String): Column = longOf(
      regexp_extract(y4mLine, "(?:^| )" + tag + "(\\d{1,9})(?:[ \n]|$)", 1))
    media
      .filter(substring(col("payload"), 1, 10) === lit("YUV4MPEG2 ").cast("binary"))
      .withColumn("hdr", y4mLine)
      .filter(col("hdr") =!= "")
      .withColumn("width", y4mNum("W"))
      .withColumn("height", y4mNum("H"))
      .filter(col("width").isNotNull && col("height").isNotNull)
      // the parameter line is pure ASCII: char length == byte length,
      // so the byte-precise body slice is exact (decodePixels' rule)
      .withColumn("hlen", length(col("hdr")))
      .withColumn("body", expr("substring(payload, hlen + 1, length(payload))"))
      .select(col("doc_id"), col("width"), col("height"),
        graft.functions.Y4mFrameStats.of(col("body"),
          col("width").cast("int"), col("height").cast("int")).as("fs"))
      .withColumn("n_frames", size(col("fs")).cast("long"))
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        posexplode(col("fs")).as(Seq("frame_idx", "s")))
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        col("frame_idx"),
        expr("(s.sum_y * 100) div (width * height)").as("mean_y_x100"),
        expr("(s.sum_u * 100) div ((width div 2) * (height div 2))").as("mean_u_x100"),
        expr("(s.sum_v * 100) div ((width div 2) * (height div 2))").as("mean_v_x100"))
  }

  /** [[decodeFeatures]] as a DECLARATIVE plan — the registry form: the
    * same magic-sniffed parse ([[parseHeader]]'s semantics, field for
    * field) expressed as codegen'd built-ins (`md5`, `regexp_extract`
    * over a bounded 96-byte head slice), so the decode is a pure
    * projection inside whole-stage codegen: no object
    * serialization boundary, no `mapPartitions`, filters/pruning push
    * straight through. `DecodeParitySpec`-checked equal to the typed
    * path; the typed path remains the seam where a real codec's
    * per-batch state would live.
    *
    * Parse hardening matches the imperative parser exactly: digit
    * runs are bounded at 9 (`\d{1,9}` + a boundary — an overlong or
    * boundary-cut run fails the match and degrades to unknown, and
    * can never throw under ANSI because only matched digit runs are
    * ever cast), the Y4M parameter line must carry its terminating
    * newline inside the window, and frames clamp to >= 1. */
  def decodeFeaturesExpr(media: DataFrame): DataFrame = {
    val head = substring(col("payload"), 1, 96).cast("string")
    // "" (no match) → null BEFORE the cast: ANSI-safe by construction
    def longOf(c: Column): Column =
      when(c === "", lit(null)).otherwise(c).cast("long")
    // maxval (group 3) is matched but never parsed, exactly like the
    // imperative PpmHeader whose length guards cover w/h only — an
    // overlong maxval must not diverge the two paths
    def ppmNum(group: Int): Column = longOf(regexp_extract(head,
      "^P6\\s+(\\d{1,9})\\s+(\\d{1,9})\\s+(\\d+)\\s", group))
    // group = the parameter line WITH its newline present in-window;
    // a boundary-truncated line extracts "" and parses nothing
    val y4mLine = regexp_extract(head, "^YUV4MPEG2 ([^\n]*)\n", 1)
    // parameter boundaries are SPACES, not \s: the imperative parser
    // splits the line on ' ' alone, so a tab-bearing token is one
    // non-numeric parameter there — \s boundaries would silently
    // accept what the imperative path rejects
    def y4mNum(tag: String): Column = longOf(
      regexp_extract(y4mLine, "(?:^| )" + tag + "(\\d{1,9})(?: |$)", 1))
    media.select(
      col("doc_id"), col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"),
      coalesce(ppmNum(1), y4mNum("W"), lit(0L)).as("width"),
      coalesce(ppmNum(2), y4mNum("H"), lit(0L)).as("height"),
      greatest(lit(1L), coalesce(y4mNum("XNFRAMES="), lit(1L))).as("frames"))
  }

  /** Decode one batch: md5 checksum over all payload bytes plus the
    * header-parsed dimensions/frames from [[parseHeader]]. */
  private[ops] def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    batch.map { r =>
      digest.reset()
      val sum = digest.digest(r.payload).map("%02x".format(_)).mkString
      val (w, h, f) = parseHeader(r.payload)
      MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, sum, w, h, f)
    }
  }

  /** Partition-batched TYPED decode — the codec-integration seam, NOT
    * the registry path ([[decodeFeaturesExpr]] computes the same
    * features declaratively and is what queries run): groups each
    * partition's iterator into [[BatchSize]] chunks so a real decoder
    * (the part that genuinely needs per-batch native state — codec
    * contexts, pinned buffers) amortizes setup per batch — the
    * mapInPandas/mapInArrow batch shape, in Scala. Until such a codec
    * exists, everything this computes is expressible as expressions,
    * so the expression form is the one in production paths;
    * parity between the two is spec-pinned. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(decodeBatch)
    }
  }

  /** REAL pixel decode for the uncompressed format: binary-PPM (P6)
    * bodies are raw interleaved 8-bit RGB triplets straight after the
    * ASCII header, so per-channel statistics need no codec library —
    * this genuinely reads pixel VALUES, upgrading the container story
    * from "header parse" to decode where the format allows it
    * (compressed formats would need the codec libs this container
    * lacks; they keep the [[decodeFeatures]] seam).
    *
    * Pipeline shape: rows are gated on the MAGIC (sniffed from bytes,
    * never trusted from `media_type`), the header length is recovered
    * from a bounded 96-byte head slice (same hardened `\d{1,9}`
    * bounds as [[decodeFeaturesExpr]] — an overlong or
    * window-cut field degrades to "not a PPM", never a wrong offset),
    * the body is sliced off at byte precision, and
    * [[graft.functions.PixelStats]] folds it in one codegen'd pass.
    * Map-only, no shuffle; only complete triplets count (floor(len/3)
    * pixels — fixture bodies are not multiple-of-3 in general), and a
    * body with zero complete pixels yields null means, the engine's
    * explicit-null-over-div-by-zero rule. All outputs integer-exact:
    * mean_*_x100 and brightness_x100 (mean over all counted channel
    * bytes) are ×100-scaled `div`s mirrored verbatim in the oracle. */
  def decodePixels(media: DataFrame): DataFrame = {
    val head = substring(col("payload"), 1, 96).cast("string")
    def longOf(c: Column): Column =
      when(c === "", lit(null)).otherwise(c).cast("long")
    def ppmNum(group: Int): Column = longOf(regexp_extract(head,
      "^P6\\s+(\\d{1,9})\\s+(\\d{1,9})\\s+(\\d+)\\s", group))
    media
      .withColumn("hdr",
        regexp_extract(head, "^(P6\\s+\\d{1,9}\\s+\\d{1,9}\\s+\\d{1,9}\\s)", 1))
      .filter(col("hdr") =!= "")
      // the header is pure ASCII, so its CHAR length equals its BYTE
      // length and the byte-precise binary substring below is exact
      // even when the body is not valid UTF-8
      .withColumn("hlen", length(col("hdr")))
      .withColumn("body", expr("substring(payload, hlen + 1, length(payload))"))
      .select(col("doc_id"),
        ppmNum(1).as("width"), ppmNum(2).as("height"),
        graft.functions.PixelStats.of(col("body")).as("ps"))
      .select(col("doc_id"), col("width"), col("height"),
        col("ps.n_pixels").as("n_pixels"),
        col("ps.sum_r").as("sum_r"), col("ps.sum_g").as("sum_g"),
        col("ps.sum_b").as("sum_b"))
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        chanMean(col("sum_r"), col("n_pixels"), 1).as("mean_r_x100"),
        chanMean(col("sum_g"), col("n_pixels"), 1).as("mean_g_x100"),
        chanMean(col("sum_b"), col("n_pixels"), 1).as("mean_b_x100"),
        chanMean(col("sum_r") + col("sum_g") + col("sum_b"),
          col("n_pixels"), 3).as("brightness_x100"))
  }

  /** ×100-scaled integer channel mean; exact `div`, explicit null on
    * an empty (zero-complete-pixel) body. */
  private def chanMean(sum: Column, nPixels: Column, perPixel: Int): Column =
    when(nPixels === 0, lit(null).cast("long"))
      .otherwise(call_function("div", sum * 100, nPixels * lit(perPixel.toLong)))

  /** Per-image channel statistics decoded from a COMPRESSED payload —
    * [[PngStats]] is [[decodePixels]]'s output shape with the same
    * ×100 integer means. */
  final case class PngStats(doc_id: Long, width: Long, height: Long,
                            n_pixels: Long, mean_r_x100: Long, mean_g_x100: Long,
                            mean_b_x100: Long, brightness_x100: Long)

  /** Deterministic planted pixel formulas shared by [[pngPayload]],
    * the spec's ground truth, and (in closed form) the DuckDB oracle:
    * dims (w, h) and per-channel values at (x, y) derive from doc_id
    * alone, so an engine that genuinely round-trips the bytes through
    * the codec can still be HASH-checked — the oracle predicts the
    * decoded stats without ever decoding a PNG. */
  private[graft] def pngDims(docId: Long): (Int, Int) =
    ((8 + docId % 9).toInt, (8 + (docId * 3) % 7).toInt)
  private[graft] def pngChannels(docId: Long, x: Int, y: Int): (Int, Int, Int) =
    (((x + y + docId) % 256).toInt,
      ((2 * x + y + 3 * docId) % 256).toInt,
      ((x + 2 * y + 7 * docId) % 256).toInt)

  /** REAL compressed-format payloads for the [[decodeFeatures]] seam:
    * one genuine PNG per document (zlib/deflate through
    * `javax.imageio` — zero new dependencies), pixels planted by
    * [[pngChannels]]. Runs in the partition-batched typed shape the
    * seam documented: the encoder is per-row native state exactly like
    * a production codec, and nothing here is expressible as a Column.
    * Map-only — at 100 TB this is one embarrassingly-parallel pass. */
  def pngPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // the codec loop inherits its parallelism from this partitioning —
    // and the input is ONE skinny id column, typically a single small
    // parquet split, which would pin encode+decode to one or two
    // threads (measured: ~3/4 of the cores idle at sf1). Spreading the
    // ids is a shuffle of bare longs, ~free next to the codec work;
    // the downstream decode chain is map-only so it keeps the spread.
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
      // ImageIO defaults to spooling every stream through a TEMP FILE
      // (useCache=true): at sf1 the disk round-trips were ~3/4 of this
      // entry's 15 s. Byte-array payloads never need the spool; the
      // setter is static + idempotent, so once per partition is free.
      javax.imageio.ImageIO.setUseCache(false)
      it.map { did =>
        val (w, h) = pngDims(did)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) {
            val (r, g, b) = pngChannels(did, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            y += 1
          }
          x += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        MediaRow(did, "image/png", out.toByteArray)
      }
    }.toDF()
  }

  /** The [[decodeFeatures]] seam made REAL for compressed codecs:
    * decode image payloads through `javax.imageio` (which routes on
    * the payload's MAGIC — the same reader handles PNG's
    * deflate/filter reconstruction and JPEG's DCT/chroma-upsample
    * paths) and fold per-channel integer sums into the
    * [[decodePixels]] stats shape. This is the one pipeline stage that
    * genuinely cannot be a Column expression — inflate/IDCT need the
    * codec — so it runs as the partition-batched typed map the seam
    * reserved for exactly this (per-batch decoder state amortized, the
    * mapInPandas shape).
    *
    * Error isolation (the I-14 rule): an undecodable payload — wrong
    * magic, truncated stream, codec error — yields NO row rather than
    * failing the batch; at 100 TB a corrupt shard must cost its own
    * rows only. Spec-pinned with a corrupted-payload case per codec. */
  def decodeImage(spark: SparkSession, media: DataFrame): Dataset[PngStats] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // see pngPayload
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { r =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case _: Exception => null }
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff
                sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff
                y += 1
              }
              x += 1
            }
            val np = w.toLong * h
            Some(PngStats(r.doc_id, w, h, np,
              sr * 100 / np, sg * 100 / np, sb * 100 / np,
              (sr + sg + sb) * 100 / (np * 3)))
          }
        }
      }
    }
  }

  /** JPEG planted channels: SMOOTH gradient planes (no mod-256
    * wrap-around inside an image — max value 159 + 2·16 + 13 < 256),
    * because JPEG is lossy and its DCT represents gradients almost
    * exactly while a wrap edge rings. The per-doc offsets keep every
    * image distinct. */
  private[graft] def jpegChannels(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((docId % 160) + 2 * x + y).toInt,
    (((docId * 3) % 160) + x + 2 * y).toInt,
    (((docId * 7) % 160) + x + y).toInt)

  /** REAL JPEG payloads through the same seam as [[pngPayload]] —
    * `javax.imageio`'s JPEG writer (DCT + Huffman + 4:2:0 chroma
    * subsampling at the default quality), zero new dependencies. Same
    * codec-loop repartition rationale as the PNG encoder. */
  def jpegPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // see pngPayload
      it.map { did =>
        val (w, h) = pngDims(did)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) {
            val (r, g, b) = jpegChannels(did, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            y += 1
          }
          x += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", out)
        MediaRow(did, "image/jpeg", out.toByteArray)
      }
    }.toDF()
  }

  /** The JPEG decode claims: encode→decode through the seam, then
    * compare the decoded channel means against the planted gradients'
    * CLOSED-FORM means. JPEG is lossy, so exact pixel equality is the
    * wrong contract — instead the entry emits the exactly-recoverable
    * fields (dims, pixel count — lossless through any codec) plus
    * per-channel booleans `|decoded − planted| ≤ tolX100` computed
    * from the GENUINE decode. The oracle states the planted dims in
    * closed form and the booleans as the claim (`true`): the hash
    * check therefore forces Spark's real DCT round-trip to land within
    * tolerance of ground truth on every row — far stronger than the
    * rows-only check the lossy seam's contract anticipated, while
    * never requiring DuckDB to decode a JPEG byte. (Unlike the HLL
    * entry, the Spark side CANNOT fake the boolean: it is derived from
    * the decoded sums, and a decode regression flips it.)
    *
    * Tolerance: the smooth planes measure ≤ ~2.6 units of mean error
    * per channel at default quality (OpsSpec pins the margin); 5 units
    * (500 in x100 fixed-point) gives the codec rounding headroom
    * without admitting a broken decode (a channel swap or filter bug
    * shifts means by tens). */
  def jpegPixelClaims(spark: SparkSession, docs: DataFrame,
                      tolX100: Long = 500L): DataFrame = {
    val decoded = decodeImage(spark, jpegPayload(spark, docs)).toDF()
    val planted = docs.select(col("doc_id"))
      .withColumn("pw", expr("8 + doc_id % 9"))
      .withColumn("ph", expr("8 + (doc_id * 3) % 7"))
      .withColumn("pnp", col("pw") * col("ph"))
      // Σ over the w×h grid of (a + p·x + q·y) =
      //   a·np + p·h·(w−1)w/2 + q·w·(h−1)h/2 — integer-exact
      .withColumn("sr", expr(
        "(doc_id % 160) * pnp + 2 * ph * ((pw-1)*pw div 2) + pw * ((ph-1)*ph div 2)"))
      .withColumn("sg", expr(
        "((doc_id * 3) % 160) * pnp + ph * ((pw-1)*pw div 2) + 2 * pw * ((ph-1)*ph div 2)"))
      .withColumn("sb", expr(
        "((doc_id * 7) % 160) * pnp + ph * ((pw-1)*pw div 2) + pw * ((ph-1)*ph div 2)"))
      .withColumn("pr", expr("sr * 100 div pnp"))
      .withColumn("pg", expr("sg * 100 div pnp"))
      .withColumn("pb", expr("sb * 100 div pnp"))
      .withColumn("pbr", expr("(sr + sg + sb) * 100 div (3 * pnp)"))
    decoded.join(planted, "doc_id")
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"),
        (abs(col("mean_r_x100") - col("pr")) <= tolX100).as("r_close"),
        (abs(col("mean_g_x100") - col("pg")) <= tolX100).as("g_close"),
        (abs(col("mean_b_x100") - col("pb")) <= tolX100).as("b_close"),
        (abs(col("brightness_x100") - col("pbr")) <= tolX100).as("brightness_close"))
  }

  /** Resize to a bounded box preserving aspect ratio — pure metadata
    * arithmetic on the decoded features (a real resizer transforms the
    * pixels too; the scale factor math is the part a pipeline plans
    * around). Integer-exact: scale = maxSide/longest in per-mille so
    * every engine rounds identically. */
  def resizeMeta(features: DataFrame, maxSide: Long = 256L): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scalePm = when(longest <= maxSide, lit(1000L))
      .otherwise((lit(maxSide) * 1000L).cast("long") / longest.cast("long"))
    features
      .withColumn("scale_pm", scalePm.cast("long"))
      .withColumn("out_width", (col("width") * col("scale_pm") / lit(1000L)).cast("long"))
      .withColumn("out_height", (col("height") * col("scale_pm") / lit(1000L)).cast("long"))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("scale_pm"), col("out_width"), col("out_height"))
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * index (every `stride`-th frame) — the explode shape a real frame
    * extractor feeds downstream encoders with. Non-video rows sample
    * their single frame 0. */
  def frameSample(features: DataFrame, stride: Long = 10L): DataFrame =
    features
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("frames") - 1, lit(stride))))
      .select(col("doc_id"), col("media_type"), col("frames"), col("frame_idx"))
}
