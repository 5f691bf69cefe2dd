package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct, exactly
  * like a 100 TB media lake (payload bytes + sidecar metadata in one row,
  * decode deferred to the edge).
  *
  * The Spark-side plumbing — schema, hashing, slicing, feature shape — is
  * real and oracle-checked. The *codec* step is STUBBED: this container has
  * no image/audio libraries, so [[decodeStub]] derives a deterministic fake
  * (dimensions from the payload checksum) and documents the real signature.
  * At scale, payload columns should be pruned out of every plan that does
  * not touch them (columnar parquet makes that free), and per-row decode
  * belongs in a `mapInArrow`/Pandas-UDF batch stage on the executor.
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

  /** STUB codec — deterministic fake decode.
    *
    * Real signature: decode(bytes) → struct(width, height, channels,
    * pixels binary); implemented here as checksum-derived dimensions so
    * downstream schema/partition logic is exercised without a codec library.
    * Replace the body with an actual decoder (e.g. via `mapInArrow`) when
    * one is available — callers only see the struct schema.
    */
  def decodeStub(bin: Column): Column = {
    val seed = abs(xxhash64(bin))
    struct(
      (seed % 1920 + lit(1L)).as("width"),
      (seed % 1080 + lit(1L)).as("height"),
      lit(3L).as("channels"))
  }
}
