package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.BinaryType

/** Anti-aliased WAV downsampling through the EXTERNAL-CODEC SEAM — the
  * iterator-batch stage that [[Multimodal.resizeBmp]] and
  * [[Multimodal.decimateWav]] both name as the home for real codecs
  * ("valid-WAV-in/valid-WAV-out is the drop-in `mapInArrow` contract").
  * This module proves that seam with one real implementation: a
  * windowed-sinc POLYPHASE decimator written in plain Scala and run via
  * `Dataset.mapPartitions` — binary column in, binary column out, the
  * exact signature an Arrow-batched external DSP/image library plugs
  * into. The expression-composed naive decimator (X147) keeps every f-th
  * sample and aliases; this one low-pass-filters first, the thing a DSP
  * library is actually for.
  *
  * Determinism contract (the X75 log-free posture): the filter taps are
  * PINNED Q15 integer literals (designed offline as
  * h[k] = (1/M)·sinc((k−C)/M)·hamming(k), quantized ×2¹⁵ — the design
  * involves sin/π, the pinned result does not), and the convolution is
  * pure integer arithmetic — y[j] = clamp₁₆(⌊(Σₖ x[jM+k−C]·h[k] + 2¹⁴)
  * / 2¹⁵⌋) with zero-padding outside the signal — so any engine replays
  * the output sample-exactly from the input formula and the tap list.
  * The floor division is computed as a truncating division of a
  * non-negative shifted numerator ((acc + 2¹⁴ + 2³¹)/2¹⁵ − 2¹⁶), because
  * truncation ≠ floor on negatives and engines disagree on which their
  * `/` means; |acc| < 1.47e9 < 2³¹ bounds the shift (Σ|h|·32768).
  *
  * Scale shape: a map-only partition iterator — zero exchanges, no
  * per-row JVM↔columnar transposition beyond what mapPartitions already
  * pays (an Arrow-batched library would use `mapInArrow` for that last
  * step; the SEAM — schema, null contract, batch iterator — is
  * identical). The 100 TB plan is the scan plus this stage.
  */
object Resample {

  /** Q15 half-band windowed-sinc taps for M=2 (N=19, Hamming, C=9):
    * designed as 0.5·sinc((k−9)/2)·(0.54−0.46·cos(2πk/18)), ×2¹⁵,
    * rounded. Every even offset from center is a true zero (the
    * half-band property), so the polyphase inner loop touches 10 taps.
    * DC gain Σh/2¹⁵ = 1.0027 — the usual quantized-sinc overshoot,
    * absorbed by the int16 clamp. */
  val TapsM2: Array[Int] = Array(
    93, 0, -280, 0, 960, 0, -2677, 0, 10141, 16384,
    10141, 0, -2677, 0, 960, 0, -280, 0, 93)

  /** Pinned taps per supported factor: 1 → the delta (identity — the
    * seam's round-trip proof), 2 → [[TapsM2]]. Other factors need their
    * own offline tap design; requiring here keeps the contract honest. */
  def taps(factor: Int): Array[Int] = factor match {
    case 1 => Array(32768)
    case 2 => TapsM2
    case other => throw new IllegalArgumentException(
      s"no pinned tap table for factor $other (have 1, 2)")
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (u16(b, o).toLong) | (u16(b, o + 2).toLong << 16)
  private def magic(b: Array[Byte], o: Int, s: String): Boolean =
    s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  /** The pure function behind the seam: canonical 44-byte-header mono
    * 16-bit PCM WAV bytes in → resampled WAV bytes out (rate′ = rate/M,
    * n′ = ⌈n/M⌉), or null on any validity failure — the same validity
    * contract as [[Multimodal.decimateWav]] (magics, PCM/mono/16-bit,
    * and octet_length covering the declared data chunk, so truncated or
    * size-lying input can never emit corrupt output). */
  def resampleWavBytes(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val h = taps(factor)
    val c = (h.length - 1) / 2
    if (bytes == null || bytes.length < 44) return null
    if (!(magic(bytes, 0, "RIFF") && magic(bytes, 8, "WAVE") &&
          magic(bytes, 12, "fmt ") && magic(bytes, 36, "data"))) return null
    if (u16(bytes, 20) != 1 || u16(bytes, 22) != 1 ||
        u16(bytes, 34) != 16) return null
    val dataLen = u32(bytes, 40)
    if (bytes.length < 44L + dataLen) return null
    val n = (dataLen / 2L).toInt
    if (n <= 0) return null
    val rate = u32(bytes, 24)
    val outN = (n + factor - 1) / factor
    val outRate = rate / factor
    val out = new Array[Byte](44 + outN * 2)
    // header: same canonical serializer layout as Multimodal.fabricateWav
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Long): Unit = {
      put16(o, (v & 0xffff).toInt); put16(o + 2, ((v >> 16) & 0xffff).toInt)
    }
    "RIFF".indices.foreach(i => out(i) = "RIFF".charAt(i).toByte)
    put32(4, 36L + outN * 2)
    "WAVE".indices.foreach(i => out(8 + i) = "WAVE".charAt(i).toByte)
    "fmt ".indices.foreach(i => out(12 + i) = "fmt ".charAt(i).toByte)
    put32(16, 16L); put16(20, 1); put16(22, 1)
    put32(24, outRate); put32(28, outRate * 2); put16(32, 2); put16(34, 16)
    "data".indices.foreach(i => out(36 + i) = "data".charAt(i).toByte)
    put32(40, outN.toLong * 2)
    var j = 0
    while (j < outN) {
      var acc = 0L
      var k = 0
      while (k < h.length) {
        if (h(k) != 0) { // half-band zeros skipped — the polyphase saving
          val i = j * factor + k - c
          if (i >= 0 && i < n) {
            val s = u16(bytes, 44 + i * 2)
            val sv = if (s >= 0x8000) s - 0x10000 else s // s16le
            acc += sv.toLong * h(k)
          }
        }
        k += 1
      }
      // floor((acc + 2^14) / 2^15) via the non-negative shift (see scaladoc)
      var y = (acc + 16384L + 2147483648L) / 32768L - 65536L
      if (y > 32767L) y = 32767L
      if (y < -32768L) y = -32768L
      put16(44 + j * 2, (y & 0xffff).toInt)
      j += 1
    }
    out
  }

  /** THE SEAM: append `out` = resampled bytes of `bin` to every row via a
    * partition iterator — the stage shape an external Arrow-batched codec
    * drops into (swap the plain-Scala kernel for the library call and
    * `mapPartitions` for `mapInArrow`; schema, null contract, and batch
    * iteration are already exactly this). */
  def resampleWav(df: DataFrame, bin: String, out: String,
                  factor: Int): DataFrame = {
    taps(factor) // validate the factor at plan time, not per partition
    val schema = df.schema.add(out, BinaryType)
    val idx = df.schema.fieldIndex(bin)
    df.mapPartitions { it =>
      it.map { r =>
        val in = if (r.isNullAt(idx)) null
                 else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ resampleWavBytes(in, factor))
      }
    }(Encoders.row(schema))
  }
}
