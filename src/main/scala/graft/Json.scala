package graft

/** Minimal JSON string escaper shared by the mains (Verify's oracle
  * dump, Bench/ScaleProbe error fields): backslash, quote, and ALL
  * control chars below 0x20 — a tab or CR inside an exception message
  * or builder-authored SQL must not emit an unparseable line, because
  * the driver json.loads these and a parse failure silently zeroes a
  * round's signal. */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** 3-decimal seconds under Locale.ROOT ('.' separator on a
    * comma-decimal JVM too) — the ONE number rendering for the mains'
    * JSON lines, shared so Bench/ScaleProbe/IsoBench artifacts can
    * never drift apart in format. Compact on purpose: the driver
    * records only an output TAIL and a long line loses its own head. */
  def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** One-line bounded exception rendering for error fields (str()
    * handles the escaping; this collapses whitespace and caps length
    * so one deep stack trace cannot blow the line budget). */
  def err(e: Throwable, max: Int = 200): String =
    e.toString.replaceAll("\\s+", " ").take(max)
}
