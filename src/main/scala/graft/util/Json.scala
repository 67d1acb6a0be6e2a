package graft.util

/** Minimal JSON string escaping shared by the driver-contract mains.
  * Escapes backslash, quote, and ALL control chars (<0x20) — a tab or CR in
  * a query name or SQL string would otherwise make the driver's json.load
  * fail and silently zero a round's results. */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
