package graft

/** Shared deterministic fuzz helpers — one xorshift64* generator and one
  * codepoint hex dump, so the fuzz corpora and failure messages cannot
  * silently diverge between specs. */
object FuzzUtil {
  final class Rng(seed: Long) {
    private var z = seed
    def nextInt(bound: Int): Int = {
      z ^= z >>> 12; z ^= z << 25; z ^= z >>> 27
      (((z * 0x2545f4914f6cdd1dL) >>> 33) % bound).toInt
    }
  }
  /** Codepoint dump for failure messages — invisible chars made visible. */
  def hex(x: String): String = x.map(c => f"${c.toInt}%04x").mkString(",")
}
