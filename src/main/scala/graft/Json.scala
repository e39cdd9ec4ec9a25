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
}
