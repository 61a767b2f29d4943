package graft.sink

/** Minimal deterministic JSON AST for payload rendering: field order is
  * insertion order (mirroring the reference's dict construction order, which
  * its tests assert), rendering is compact and stable.
  */
sealed trait JVal { def render: String }

final case class JStr(s: String) extends JVal {
  override def render: String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}

final case class JLong(v: Long) extends JVal { override def render: String = v.toString }

final case class JDouble(v: Double) extends JVal {
  // Render integral doubles as "2.0" (Python float repr), not "2" — but only
  // below 1e15: v.toLong saturates at Long.MaxValue, so 1e19 would silently
  // render as "9223372036854775807.0" (and Python's own repr switches to
  // exponent form near this magnitude anyway). Beyond the bound, fall back
  // to the Double's representation (valid JSON exponent form).
  override def render: String =
    if (v == Math.floor(v) && !v.isInfinite && math.abs(v) < 1e15)
      s"${v.toLong}.0"
    else v.toString
}

final case class JBool(v: Boolean) extends JVal { override def render: String = v.toString }

case object JNull extends JVal { override def render: String = "null" }

final case class JArr(items: Seq[JVal]) extends JVal {
  override def render: String = items.map(_.render).mkString("[", ", ", "]")
}

final case class JObj(fields: Seq[(String, JVal)]) extends JVal {
  override def render: String =
    fields.map { case (k, v) => s"${JStr(k).render}: ${v.render}" }.mkString("{", ", ", "}")
  /** Python-dict assignment semantics, which the reference's payload
    * builders rely on: setting an existing key REPLACES its value in
    * place (keeping the original field position, as json.dumps renders a
    * dict), never appends a duplicate JSON key.
    */
  def +(field: (String, JVal)): JObj =
    if (fields.exists(_._1 == field._1))
      JObj(fields.map(f => if (f._1 == field._1) field else f))
    else JObj(fields :+ field)
  def ++(more: Seq[(String, JVal)]): JObj = more.foldLeft(this)(_ + _)
}

object Json {
  def obj(fields: (String, JVal)*): JObj = JObj(fields.toSeq)
  def arr(items: JVal*): JArr = JArr(items.toSeq)

  /** Coerce a row value (from Row.getValuesMap / renderer maps) to JSON. */
  def of(v: Any): JVal = v match {
    case null             => JNull
    case s: String        => JStr(s)
    case b: Boolean       => JBool(b)
    case i: Int           => JLong(i.toLong)
    case l: Long          => JLong(l)
    case d: Double        => JDouble(d)
    case f: Float         => JDouble(f.toDouble)
    case m: Map[_, _]     => JObj(m.toSeq.map { case (k, x) => k.toString -> of(x) })
    case s: Seq[_]        => JArr(s.map(of))
    case j: JVal          => j
    case other            => JStr(other.toString)
  }
}
