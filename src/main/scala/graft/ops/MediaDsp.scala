package graft.ops

/** Dependency-free integer DSP for the perceptual step of the media
  * fingerprint — the transform behind [[Multimodal.decodeDctFeatures]],
  * replacing the positional-mean stand-in that was the repo's last
  * non-real media stage (the containers themselves are real codecs,
  * [[MediaCodec]]).
  *
  * This is the pHash recipe (downscale → DCT → low-frequency
  * coefficients → threshold bits) with every step EXACT INTEGER so the
  * fingerprint is engine-portable bit for bit:
  *
  *  - Downscale: the parsed payload (PPM pixels / WAV PCM samples) is
  *    split into [[Grid]] equal positional cells; each cell's byte mean
  *    is fixed-pointed as `(sum * 256) / count` (floor — DuckDB's `//`
  *    over non-negative BIGINTs computes the identical value).
  *  - Transform: a DCT-II over the cell means with a fixed-point cosine
  *    table `round(cos(pi*(2j+1)*k/(2*Grid)) * 2^14)`. The table is a
  *    compile-time constant; the DuckDB oracle receives THE SAME table
  *    as interpolated literals, so portability never depends on either
  *    engine's libm. Only the [[Coeffs]] lowest AC coefficients
  *    (k = 1..15) are kept — the low-frequency shape, per pHash.
  *  - The 60-bit binarization (4 mean-magnitude-relative thresholds per
  *    coefficient) happens downstream in Catalyst expressions
  *    (MediaQueries.q200) over these exact integers.
  *
  * The audio arm shares the DCT: over downscaled PCM it is the signal's
  * low-frequency spectral envelope — the honest dependency-free analog
  * of a spectral fingerprint. A mel filterbank was REJECTED, not
  * skipped: mel energies weight an FFT *magnitude* spectrum (phase-
  * invariant), and a faithful |FFT|² would add nothing at this 15-
  * coefficient width while breaking the exact-integer oracle contract;
  * the DCT envelope has the same re-encode/small-edit robustness for
  * stored (never re-synced) audio.
  *
  * Range proof (all in long, no overflow): cell mean ≤ 255·256 = 65280;
  * |table entry| ≤ 2^14; |coefficient| ≤ 32·65280·16384 ≈ 3.4e13; the
  * downstream 60·c vs θ·Σ|c| comparisons stay ≤ 2.1e15 « 2^63.
  */
object MediaDsp {

  /** Positional downscale cells (the pHash "32-pixel row"). */
  val Grid = 32

  /** Low-frequency AC coefficients kept (k = 1..Coeffs): 15 coefficients
    * × 4 threshold bits = the 60-bit fingerprint. */
  val Coeffs = 15

  /** Fixed-point scale for the cosine table (2^14). */
  val Scale = 16384L

  /** cosTable(k-1)(j) = round(cos(pi*(2j+1)*k/(2*Grid)) * Scale).
    * StrictMath: defined, JVM-independent semantics — and the oracle gets
    * these exact values as literals ([[cosTableSqlValues]]), so the SQL
    * twin is table-identical by construction. Row sums are exactly 0
    * (the rounding preserves the analytic zero by the j ↔ Grid-1-j
    * symmetry), so a constant signal has ALL-ZERO AC coefficients —
    * pinned in MultimodalSpec. */
  val cosTable: Array[Array[Long]] = Array.tabulate(Coeffs, Grid) { (k0, j) =>
    math.round(StrictMath.cos(
      StrictMath.PI * (2 * j + 1) * (k0 + 1) / (2.0 * Grid)) * Scale)
  }

  /** The same table as a SQL VALUES list `(k, j, c)` for the DuckDB
    * oracle: k = 1..Coeffs, j = 0..Grid-1. */
  def cosTableSqlValues: String =
    cosTable.zipWithIndex.flatMap { case (row, k0) =>
      row.zipWithIndex.map { case (c, j) => s"(${k0 + 1},$j,$c)" }
    }.mkString(", ")

  /** Fixed-point cell means from positional sums/counts: empty cells
    * (payload shorter than [[Grid]]) are 0. */
  def cellMeans(sums: Array[Long], counts: Array[Long]): Array[Long] = {
    val v = new Array[Long](Grid)
    var j = 0
    while (j < Grid) {
      if (counts(j) > 0) v(j) = sums(j) * 256 / counts(j)
      j += 1
    }
    v
  }

  /** DCT-II low-frequency coefficients (k = 1..Coeffs) of the payload:
    * one pass building the positional cells (byte i of n lands in cell
    * i·Grid/n — decodeSegments' assignment), then the fixed-point
    * transform. Empty payload → all zeros (callers filter n > 0). */
  def dctFingerprint(payload: Array[Byte]): Array[Long] = {
    val n = payload.length
    val sums = new Array[Long](Grid)
    val counts = new Array[Long](Grid)
    var i = 0
    while (i < n) {
      val s = (i.toLong * Grid / n).toInt
      sums(s) += (payload(i) & 0xff)
      counts(s) += 1
      i += 1
    }
    dctOfCells(cellMeans(sums, counts))
  }

  /** The transform alone (exposed for the spec's linearity/delta pins). */
  def dctOfCells(v: Array[Long]): Array[Long] = {
    require(v.length == Grid, s"expected $Grid cells, got ${v.length}")
    val out = new Array[Long](Coeffs)
    var k = 0
    while (k < Coeffs) {
      val row = cosTable(k)
      var acc = 0L
      var j = 0
      while (j < Grid) { acc += v(j) * row(j); j += 1 }
      out(k) = acc
      k += 1
    }
    out
  }
}
