package graft.serve

/** Tiny JSON document model + writer for the serving layer's responses
  * (X-family surface). Mirrors Flask's `jsonify` conventions the
  * reference relies on (`/root/reference/README.md:17-64` golden
  * sample): object keys sorted, doubles rendered with a trailing `.0`
  * (`80.0`, not `80`), UTF-8.
  *
  * Writer only — requests carry no JSON in the reference API (uploads
  * are multipart); tests parse responses with their own reader.
  */
sealed trait JVal { def render: String = Json.render(this) }
final case class JStr(v: String) extends JVal
final case class JLong(v: Long) extends JVal
final case class JDouble(v: Double) extends JVal
final case class JBool(v: Boolean) extends JVal
case object JNull extends JVal
final case class JArr(items: Seq[JVal]) extends JVal
final case class JObj(fields: Seq[(String, JVal)]) extends JVal

object JObj {
  def of(fields: (String, JVal)*): JObj = JObj(fields)
}

object Json {

  def render(v: JVal): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }

  private def write(v: JVal, sb: StringBuilder): Unit = v match {
    case JStr(s)    => quote(s, sb)
    case JLong(n)   => sb.append(n)
    case JDouble(d) =>
      if (d.isNaN || d.isInfinite) sb.append("null")
      // integral doubles print python-style: jsonify(80.0) -> "80.0"
      else if (d == math.rint(d) && math.abs(d) < 1e15)
        sb.append(d.toLong).append(".0")
      else sb.append(d)
    case JBool(b)   => sb.append(b)
    case JNull      => sb.append("null")
    case JArr(xs)   =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(", ")
        first = false
        write(x, sb)
      }
      sb.append(']')
    case JObj(fs)   =>
      sb.append('{')
      var first = true
      fs.sortBy(_._1).foreach { case (k, x) =>
        if (!first) sb.append(", ")
        first = false
        quote(k, sb)
        sb.append(": ")
        write(x, sb)
      }
      sb.append('}')
  }

  private def quote(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
