package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing AND pure-expression codecs: image/audio/video
  * payloads ride through the pipeline as opaque `binary` columns with a
  * typed metadata struct, exactly like a 100 TB media lake (payload bytes +
  * sidecar metadata in one row, decode deferred to the edge).
  *
  * Two real decoders live here, needing no codec library because their
  * container formats are fixed-layout public specs:
  *  - [[decodeWav]] — canonical 44-byte-header PCM WAV (RIFF/WAVE/fmt/data,
  *    the layout `sox`/`ffmpeg` emit by default): channels, sample rate,
  *    bit depth, sample count, duration, and per-sample statistics;
  *  - [[decodeBmp]] — uncompressed 24-bit BITMAPINFOHEADER BMP: dimensions,
  *    bit depth, and pixel statistics that honor the 4-byte row padding.
  *
  * Both are compositions of built-in expressions (substr + hex + conv byte
  * accessors, `transform`/`aggregate` over the sample region), so decode
  * stays inside whole-stage codegen — no UDF, no mapPartitions, and Parquet
  * column pruning still drops the payload from every plan that doesn't
  * touch it. A codec for a COMPRESSED format (JPEG, FLAC) genuinely needs a
  * library and belongs in a `mapInArrow` batch stage on the executor; the
  * struct schemas these decoders return are the contract such a stage would
  * fill.
  */
object Multimodal {

  /** Pack a string column into a payload: (bytes binary, meta struct
    * {mime, n_bytes, checksum}). With real media, `bytes` would come from
    * `spark.read.format("binaryFile")` instead.
    */
  def packPayload(df: DataFrame, textCol: String, mime: String = "text/plain"): DataFrame = {
    val bytes = encode(col(textCol), "UTF-8")
    df.withColumn("payload", struct(
      bytes.as("bytes"),
      struct(
        lit(mime).as("mime"),
        octet_length(bytes).cast("long").as("n_bytes"),
        md5(bytes).as("checksum")).as("meta")))
  }

  /** First `n` bytes of a binary column (binary substring is 1-based). */
  def head(bin: Column, n: Int): Column = substring(bin, 1, n)

  /** Evenly strided "frame" samples of a payload: `k` slices of `frameLen`
    * bytes — the batch shape a video frame-sampler produces. Short payloads
    * yield fewer (possibly truncated) frames.
    */
  def frameSample(bin: Column, k: Int, frameLen: Int): Column = {
    val n = octet_length(bin)
    val stride = greatest((n / k).cast("int"), lit(1))
    filter(
      transform(sequence(lit(0), lit(k - 1)),
        i => substr(bin, i * stride + lit(1), lit(frameLen))),
      f => octet_length(f) > 0)
  }

  /** Deterministic 16-bin byte histogram computed from the hex encoding
    * (each hex digit = one nibble): the shape of a feature-extraction pass,
    * with exact integer counts any engine reproduces.
    */
  def nibbleHistogram(bin: Column): Column = {
    val h = lower(hex(bin))
    array((0 until 16).map { i =>
      val digit = i.toHexString
      (length(h) - length(regexp_replace(h, digit, ""))).cast("long")
    }: _*)
  }

  // ---- binary field accessors ---------------------------------------------
  // substr(1-based) + hex + conv: every byte read is a built-in expression
  // chain, so decoders composed from these stay in whole-stage codegen.

  /** unsigned byte at 0-based offset `off` */
  private def u8(bin: Column, off: Column): Column =
    conv(hex(substr(bin, (off + 1).cast("int"), lit(1))), 16, 10).cast("long")

  /** little-endian field: bytes reversed into big-endian hex, one conv */
  private def leHex(bin: Column, off: Column, nBytes: Int): Column =
    concat((nBytes - 1 to 0 by -1).map(k =>
      hex(substr(bin, (off + k + 1).cast("int"), lit(1)))): _*)

  /** unsigned 16-bit little-endian at 0-based `off` */
  def u16le(bin: Column, off: Column): Column =
    conv(leHex(bin, off, 2), 16, 10).cast("long")

  /** unsigned 32-bit little-endian at 0-based `off` */
  def u32le(bin: Column, off: Column): Column =
    conv(leHex(bin, off, 4), 16, 10).cast("long")

  /** signed 16-bit little-endian (two's complement) at 0-based `off` */
  def s16le(bin: Column, off: Column): Column = {
    val u = u16le(bin, off)
    when(u >= 32768L, u - 65536L).otherwise(u)
  }

  /** true iff the bytes at 0-based `off` spell `ascii` (compared in hex —
    * charset-free) */
  private def magicIs(bin: Column, off: Int, ascii: String): Column =
    hex(substr(bin, lit(off + 1), lit(ascii.length))) ===
      ascii.getBytes("US-ASCII").map("%02X".format(_)).mkString

  // ---- fabrication (the test/oracle side of fabricate-then-decode) --------

  /** hex pair of one byte value (0..255 expected) */
  private def byteHex(v: Column): Column = lpad(hex(pmod(v, lit(256L))), 2, "0")
  private def u16leHex(v: Column): Column =
    concat(byteHex(v), byteHex(floor(v / 256.0).cast("long")))
  private def u32leHex(v: Column): Column =
    concat((0 until 4).map(k =>
      byteHex(floor(v / math.pow(256, k)).cast("long"))): _*)

  /** Serialize a canonical mono 16-bit PCM WAV: 44-byte RIFF/WAVE/fmt/data
    * header + little-endian samples. `samples` is array<long> of signed
    * 16-bit values. Pure expressions — fabrication runs distributed, and
    * the DuckDB oracle replays the same arithmetic.
    */
  def fabricateWav(sampleRate: Column, samples: Column): Column = {
    val n = size(samples).cast("long")
    val dataBytes = n * 2L
    unhex(concat(
      lit("52494646"),                    // "RIFF"
      u32leHex(dataBytes + 36L),          // riff payload size
      lit("57415645"), lit("666D7420"),   // "WAVE", "fmt "
      u32leHex(lit(16L)),                 // fmt chunk size
      u16leHex(lit(1L)),                  // PCM
      u16leHex(lit(1L)),                  // mono
      u32leHex(sampleRate),
      u32leHex(sampleRate * 2L),          // byte rate
      u16leHex(lit(2L)),                  // block align
      u16leHex(lit(16L)),                 // bits per sample
      lit("64617461"),                    // "data"
      u32leHex(dataBytes),
      array_join(transform(samples,
        s => u16leHex(pmod(s + 65536L, lit(65536L)))), "")))
  }

  /** Serialize an uncompressed 24-bit BITMAPINFOHEADER BMP whose pixel-array
    * byte k of (bottom-up) row r is `pix(r, k)` (0..255). Rows are padded to
    * 4-byte boundaries with zeros, as the format requires — the part naive
    * "readers" get wrong and [[decodeBmp]] must skip.
    */
  def fabricateBmp(w: Column, h: Column,
                   pix: (Column, Column) => Column): Column = {
    val rowBytes = w * 3L
    val stride = floor((rowBytes + 3L) / 4.0).cast("long") * 4L
    val pad = stride - rowBytes
    val body = array_join(transform(sequence(lit(0L), h - 1L), r =>
      concat(
        array_join(transform(sequence(lit(0L), rowBytes - 1L),
          k => byteHex(pix(r, k))), ""),
        substr(lit("000000"), lit(1), (pad * 2L).cast("int")))), "")
    unhex(concat(
      lit("424D"),                        // "BM"
      u32leHex(stride * h + 54L),         // file size
      u32leHex(lit(0L)),                  // reserved
      u32leHex(lit(54L)),                 // pixel-array offset
      u32leHex(lit(40L)),                 // BITMAPINFOHEADER size
      u32leHex(w), u32leHex(h),
      u16leHex(lit(1L)),                  // planes
      u16leHex(lit(24L)),                 // bpp
      u32leHex(lit(0L)),                  // BI_RGB (uncompressed)
      u32leHex(stride * h),               // image size
      u32leHex(lit(0L)), u32leHex(lit(0L)), // ppm x/y
      u32leHex(lit(0L)), u32leHex(lit(0L)), // palette counts
      body))
  }

  // ---- perceptual hashes --------------------------------------------------

  /** 8×8 average hash over a decoded BMP's pixels — the perceptual
    * signature feeding [[Dedup.hammingNearDups64]]; see
    * [[graft.plans.MediaHashOps.bmpAHash64]]. */
  def bmpAHash64(bin: Column): Column =
    graft.plans.MediaHashExpressions.bmpAHash64(bin)

  /** 64-segment energy envelope over a decoded WAV's samples — the audio
    * twin of [[bmpAHash64]]; see
    * [[graft.plans.MediaHashOps.wavEnvelope64]]. */
  def wavEnvelope64(bin: Column): Column =
    graft.plans.MediaHashExpressions.wavEnvelope64(bin)

  // ---- transforms ---------------------------------------------------------

  /** Nearest-neighbor resize of an uncompressed 24-bit BMP to `newW × newH`,
    * emitted as a fresh valid BMP (the missing member of the multimodal
    * quartet: decode / feature-extract / frame-sample / RESIZE). Output
    * pixel (storage row r′, column c′) copies source pixel
    * (r′·h div newH, c′·w div newW) — the classic index map, per channel —
    * so the result is a pure function of the input bytes that any engine
    * replays from the generative pixel formula without parsing a byte.
    * Source dimensions come from the input's own header; rows are read at
    * the source's 4-byte-aligned stride and written at the output's (the
    * two differ whenever 3·width crosses a pad boundary — the case a naive
    * resizer corrupts). Composed entirely of built-in expressions
    * (substr+hex+conv byte reads inside [[fabricateBmp]]'s serializer), so
    * it stays in whole-stage codegen; invalid/truncated input → null,
    * never a throw. Cost is newW·newH·3 byte reads per row — a THUMBNAIL
    * device (the resize a perceptual-hash or preview stage needs); a
    * full-resolution transcode belongs in a `mapInArrow` batch stage, for
    * which this expression's contract (valid BMP in, valid BMP out) is the
    * drop-in signature — a contract PROVEN on the audio side by
    * [[graft.ext.Resample]]'s windowed-sinc decimator (q175).
    *
    * Vertical anchoring note: the index map runs over STORAGE rows, and BMP
    * stores rows bottom-up, so the vertical sampling grid anchors at the
    * image BOTTOM — equivalent to flip ∘ top-anchored-NN ∘ flip. Whenever
    * `newH` does not divide `h` this selects different source rows than
    * PIL/OpenCV's top-anchored convention. Deliberate: it keeps the
    * generative formula replayable per storage byte and the q172
    * resize∘resize commute identity exact; library-parity thumbnails want
    * the r′ → h−1−⌊(newH−1−r′)·h/newH⌋ map instead.
    */
  def resizeBmp(bin: Column, newW: Int, newH: Int): Column = {
    require(newW > 0 && newH > 0, "resize dimensions must be positive")
    val off = u32le(bin, lit(10L))
    val w = u32le(bin, lit(18L))
    val h = u32le(bin, lit(22L))
    val srcStride = floor((w * 3L + 3L) / 4.0).cast("long") * 4L
    // The last clause bounds the declared pixel array against the actual
    // byte count: a header-valid but truncated input must yield null, not a
    // corrupt BMP assembled from null byte-reads silently dropped by the
    // serializer's array_join.
    val valid = magicIs(bin, 0, "BM") && octet_length(bin) >= 54 &&
      u32le(bin, lit(14L)) === 40L && u16le(bin, lit(28L)) === 24L &&
      u32le(bin, lit(30L)) === 0L &&
      octet_length(bin).cast("long") >= off + h * srcStride
    val resized = fabricateBmp(lit(newW.toLong), lit(newH.toLong), (r, k) => {
      // k is the byte index within the output row: pixel k div 3, channel
      // k mod 3. Integer division via floor(double) is exact while the
      // products stay under 2^52 — guaranteed by the decoder's ~10^8-pixel
      // validity envelope.
      val srcR = floor(r * h / lit(newH.toDouble)).cast("long")
      val srcC = floor(floor(k / lit(3.0)).cast("long") * w /
        lit(newW.toDouble)).cast("long")
      u8(bin, off + srcR * srcStride + srcC * 3L + pmod(k, lit(3L)))
    })
    when(valid, resized)
  }

  /** Integer-factor WAV decimation (the audio twin of [[resizeBmp]]): keep
    * every `factor`-th sample of a canonical 44-byte-header mono 16-bit PCM
    * WAV and emit a fresh valid WAV whose sample rate and data chunk shrink
    * by the factor — sample j of the output is sample j·factor of the
    * input, rate′ = rate div factor. Like the classic naive decimator this
    * applies NO anti-alias filter (aliasing is the caller's concern — the
    * structural plumbing is the point; a real polyphase resampler belongs
    * in an iterator batch stage, for which valid-WAV-in/valid-WAV-out is
    * the drop-in contract — EXERCISED by [[graft.ext.Resample]]'s
    * windowed-sinc decimator, q175). Pure built-in expressions;
    * invalid/non-mono/non-16-bit input → null.
    */
  def decimateWav(bin: Column, factor: Int): Column = {
    require(factor > 0, "decimation factor must be positive")
    // The octet_length clause bounds the untrusted 4-byte data-chunk size
    // against the actual byte count, closing two holes at once: a truncated
    // input can no longer emit a corrupt non-null WAV (null sample reads
    // silently dropped by array_join), and a size-lying header can no longer
    // drive a multi-GB sequence() allocation — outN is now bounded by the
    // real input size.
    val valid = magicIs(bin, 0, "RIFF") && magicIs(bin, 8, "WAVE") &&
      magicIs(bin, 12, "fmt ") && magicIs(bin, 36, "data") &&
      octet_length(bin) >= 44 &&
      u16le(bin, lit(20L)) === 1L && u16le(bin, lit(22L)) === 1L &&
      u16le(bin, lit(34L)) === 16L &&
      octet_length(bin).cast("long") >= lit(44L) + u32le(bin, lit(40L))
    val rate = u32le(bin, lit(24L))
    val n = floor(u32le(bin, lit(40L)) / u16le(bin, lit(32L))).cast("long")
    val outN = floor((n + (factor - 1)) / lit(factor.toDouble)).cast("long")
    val samples = transform(sequence(lit(0L), outN - 1L),
      j => s16le(bin, lit(44L) + j * (factor * 2L)))
    when(valid && n > 0L,
      fabricateWav(floor(rate / lit(factor.toDouble)).cast("long"), samples))
  }

  // ---- decoders -----------------------------------------------------------

  /** Decode a canonical 44-byte-header mono/stereo PCM WAV from its bytes
    * alone: validate the RIFF/WAVE/fmt/data magics and PCM tag, then read
    * format fields, derive sample count and duration from the data-chunk
    * size, and fold per-sample statistics. Invalid input → `valid = 0` with
    * NULL fields, never a throw (a 100 TB media lake always holds some
    * corrupt payloads; a decoder that kills the stage is useless).
    *
    * duration_us uses integer arithmetic (`floor(data·10⁶ / byte_rate)`) so
    * the value is engine-exact; sum/max of |sample| are exact longs.
    */
  def decodeWav(bin: Column): Column = {
    val valid = magicIs(bin, 0, "RIFF") && magicIs(bin, 8, "WAVE") &&
      magicIs(bin, 12, "fmt ") && magicIs(bin, 36, "data") &&
      u16le(bin, lit(20L)) === 1L && octet_length(bin) >= 44
    val channels = u16le(bin, lit(22L))
    val rate = u32le(bin, lit(24L))
    val byteRate = u32le(bin, lit(28L))
    val block = u16le(bin, lit(32L))
    val bits = u16le(bin, lit(34L))
    val dataBytes = u32le(bin, lit(40L))
    val n = floor(dataBytes / block).cast("long")
    val absSamples = transform(sequence(lit(0L), n - 1L),
      i => abs(s16le(bin, lit(44L) + i * 2L)))
    struct(
      valid.cast("long").as("valid"),
      when(valid, channels).as("channels"),
      when(valid, rate).as("sample_rate"),
      when(valid, bits).as("bits_per_sample"),
      when(valid, n).as("n_samples"),
      when(valid, floor(dataBytes * 1000000L / byteRate).cast("long"))
        .as("duration_us"),
      when(valid, aggregate(absSamples, lit(0L), (acc, x) => acc + x))
        .as("sum_abs"),
      when(valid, array_max(absSamples)).as("max_abs"))
  }

  /** Decode an uncompressed 24-bit BITMAPINFOHEADER BMP from its bytes
    * alone: validate the "BM" magic, header size, bit depth, and BI_RGB
    * compression tag, read dimensions from the DIB header, and fold a
    * pixel-byte sum that reads exactly the 3·width payload bytes of each
    * row at its 4-byte-aligned stride — skipping the padding is the
    * round-trip proof that the stride math is right. Invalid → `valid = 0`
    * with NULL fields.
    */
  def decodeBmp(bin: Column): Column = {
    val valid = magicIs(bin, 0, "BM") && octet_length(bin) >= 54 &&
      u32le(bin, lit(14L)) === 40L && u16le(bin, lit(28L)) === 24L &&
      u32le(bin, lit(30L)) === 0L
    val off = u32le(bin, lit(10L))
    val w = u32le(bin, lit(18L))
    val h = u32le(bin, lit(22L))
    val rowBytes = w * 3L
    val stride = floor((rowBytes + 3L) / 4.0).cast("long") * 4L
    val sumPixels = aggregate(
      sequence(lit(0L), h * rowBytes - 1L),
      lit(0L),
      (acc, j) => acc + u8(bin,
        off + floor(j / rowBytes).cast("long") * stride + pmod(j, rowBytes)))
    struct(
      valid.cast("long").as("valid"),
      when(valid, w).as("width"),
      when(valid, h).as("height"),
      when(valid, u16le(bin, lit(28L))).as("bpp"),
      when(valid, sumPixels).as("sum_pixels"))
  }
}
