package graft.format

/** Declared table sort order (reference api/.../SortOrder.java, surfaced
  * here as the `write.sort-order` property: "col [asc|desc]
  * [nulls-first|nulls-last], ..."). One parser shared by the write path
  * (GraftWriteBuilder.requiredOrdering) and maintenance (rewrite_data_files
  * defaults to the declared order), so the two can never disagree. */
object SortOrders {

  val PropertyKey = "write.sort-order"

  final case class Field(column: String, ascending: Boolean, nullsFirst: Boolean)

  def parse(spec: String): Seq[Field] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      val toks = part.split("\\s+").toSeq
      val lower = toks.map(_.toLowerCase)
      val asc = !lower.contains("desc")
      val nullsFirst = lower.find(t => t == "nulls-first" || t == "nulls-last") match {
        case Some("nulls-last") => false
        case Some("nulls-first") => true
        case _ => asc // Spark's default: asc → nulls first, desc → nulls last
      }
      Field(toks.head, asc, nullsFirst)
    }

  def fromProperties(props: Map[String, String]): Seq[Field] =
    props.get(PropertyKey).map(parse).getOrElse(Nil)
}
