package graft

/** Tone-coded synthetic PCM for the audio specs. The r15 spectral
  * frame feature made amplitude-coded fixtures meaningless: a
  * constant-char frame is spectrally VOID (every non-DC bin zero) and
  * all constant frames share one feature, while the old byte-energy
  * feature saw them as distinct. Frames here carry actual TONES — a
  * primary and a runner-up cosine at distinct bins — so each class
  * lands on a distinct, deterministic spectral feature byte
  * ((b1−1)·32 + (b2−1)·4 + r with r = 2 at the 60/25 amplitude split).
  *
  * 56 classes (8 primary bins × 7 runner-up offsets); class identity
  * is what the specs key on, exactly as they keyed on distinct
  * energies before.
  */
object ToneAudio {
  private val w = operators.AudioMatch.FrameLen

  /** Primary/runner-up bins of a class (b1 ∈ 1..8, b2 ≠ b1). */
  def bins(cls: Int): (Int, Int) = {
    val b1 = cls % 8 + 1
    val b2 = (b1 - 1 + 1 + (cls / 8) % 7) % 8 + 1
    (b1, b2)
  }

  /** One frame of class `cls` ∈ [0, 56): x_k = 128 + 60·cos(2πb1k/16)
    * + 25·cos(2πb2k/16), rounded — chars stay in [43, 213]. `scale`
    * multiplies both amplitudes (the amplitude-robustness specs). */
  def frame(cls: Int, scale: Double = 1.0): String = {
    val (b1, b2) = bins(cls)
    (0 until w).map { k =>
      val v = 128 +
        math.round(scale * 60 * math.cos(2 * math.Pi * b1 * k / w)).toInt +
        math.round(scale * 25 * math.cos(2 * math.Pi * b2 * k / w)).toInt
      v.toChar
    }.mkString
  }

  /** Payload from a class sequence. */
  def payload(classes: Seq[Int], scale: Double = 1.0): String =
    classes.map(frame(_, scale)).mkString

  /** The expected spectral feature byte of a class at the default
    * amplitude split (ratio (60/25)² = 5.76 → bucket 2) — the specs'
    * independent restatement of the packed feature. */
  def feature(cls: Int): Long = {
    val (b1, b2) = bins(cls)
    (b1 - 1) * 32L + (b2 - 1) * 4L + 2L
  }
}
