package graft.tools

/** Locale-proof numeric formatting for JSON-bound strings.
  *
  * The `f` interpolator formats through the JVM DEFAULT locale; under a
  * comma-decimal locale (de/fr/tr) `f"$x%.3f"` emits `0,330` and every
  * committed BENCH/DRILL artifact becomes unparseable JSON. All
  * machine-read number formatting routes through here (Locale.ROOT),
  * and non-finite doubles — a rows/s division by a zero wall measures
  * Infinity — serialize as JSON `null` instead of the bare `Infinity`
  * token JSON has no lexeme for.
  */
object JsonNum {
  def num(d: Double, decimals: Int): String =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) "null"
    else String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(d))
}
