package graft

/** Shared helpers for the machine-readable JSON result lines the mains emit
  * (Bench, Main): locale-safe number formatting and string escaping. One
  * definition so a path with a quote/backslash can't corrupt one surface
  * while the other stays safe. */
object JsonOut {

  // Locale.ROOT: the f-interpolator uses the default locale, and a
  // comma-decimal or non-ASCII-digit locale would corrupt the JSON line
  def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

  /** JSON string escape for interpolated values (paths can contain quotes). */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
