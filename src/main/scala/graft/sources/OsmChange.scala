package graft.sources

/** OSM XML writers — the reference's XML output in both document shapes:
  *
  *  - change files (.osc) with create/modify/delete run grouping
  *    (reference/include/osmium/output/xml.hpp:205-227 open_close_op_tag;
  *    op derivation :96,:114,:134: visible ? (version==1 ? create :
  *    modify) : delete)
  *  - plain .osm documents (`<osm>` root, optional `<bounds>` header from
  *    Meta, xml.hpp:70-92 + osm/meta.hpp:34-89), where history files
  *    (has_multiple_object_versions) add a `visible` attribute per object
  *    (xml.hpp:188-190)
  *
  * Attribute order and conditional attributes per write_meta :171-193.
  * Formatting mirrors libxml2 xmlTextWriter with SetIndent(1) and a
  * two-space indent string: every element on its own line, empty elements
  * self-closed, `<?xml version="1.0"?>` header.
  *
  * These are the golden text formatters (test-only surface per SURVEY
  * §2.1); the scalable grouping OPERATOR over an ordered stream is the
  * gaps-and-islands window in SparkEntry's q_change_groups.
  */
object OsmChange {

  /** One object of a change stream, already in stream order. */
  case class ChangeObj(kind: String, id: Long, version: Int, visible: Boolean,
                       tsIso: String, uid: Int, user: String, changeset: Long,
                       latLon: Option[(Double, Double)] = None,
                       nds: Seq[Long] = Nil,
                       members: Seq[(String, Long, String)] = Nil,
                       tags: Seq[(String, String)] = Nil)

  /** visible ? (version==1 ? 'c' : 'm') : 'd' (xml.hpp:96). */
  def op(o: ChangeObj): Char =
    if (!o.visible) 'd' else if (o.version == 1) 'c' else 'm'

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c => c.toString
  }

  private def groupName(op: Char): String = op match {
    case 'c' => "create"
    case 'm' => "modify"
    case 'd' => "delete"
  }

  /** Read a change file back into (op, object) pairs in document order —
    * the inverse of changeXml, closing the write→read round trip. The
    * object's `visible` flag is reconstructed from the enclosing group
    * (delete → false), exactly inverting the writer's op derivation.
    */
  def parseChange(xml: String): Seq[(Char, ChangeObj)] = {
    val root = scala.xml.XML.loadString(xml)
    def attr(e: scala.xml.Node, a: String, dflt: String = ""): String = {
      val v = (e \ s"@$a").text; if (v.isEmpty) dflt else v
    }
    for {
      group <- root.child.toSeq if Seq("create", "modify", "delete").contains(group.label)
      el <- group.child if Seq("node", "way", "relation").contains(el.label)
    } yield {
      val op = group.label.charAt(0)
      val latLon =
        if ((el \ "@lat").nonEmpty) Some((attr(el, "lat").toDouble, attr(el, "lon").toDouble))
        else None
      (op, ChangeObj(el.label, attr(el, "id").toLong, attr(el, "version", "0").toInt,
        visible = op != 'd',
        attr(el, "timestamp"), attr(el, "uid", "0").toInt, attr(el, "user"),
        attr(el, "changeset", "0").toLong, latLon,
        (el \ "nd").map(nd => (nd \ "@ref").text.toLong),
        (el \ "member").map(m =>
          ((m \ "@type").text, (m \ "@ref").text.toLong, (m \ "@role").text)),
        (el \ "tag").map(t => ((t \ "@k").text, (t \ "@v").text))))
    }
  }

  def changeXml(objs: Seq[ChangeObj], generator: String = "graft"): String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\"?>\n"
    sb ++= s"""<osmChange version="0.6" generator="${esc(generator)}">\n"""
    var lastOp: Char = '\u0000'
    objs.foreach { o =>
      val thisOp = op(o)
      if (thisOp != lastOp) {
        if (lastOp != '\u0000') sb ++= s"  </${groupName(lastOp)}>\n"
        sb ++= s"  <${groupName(thisOp)}>\n"
        lastOp = thisOp
      }
      writeObj(sb, o, "    ", history = false)
    }
    if (lastOp != '\u0000') sb ++= s"  </${groupName(lastOp)}>\n"
    sb ++= "</osmChange>\n"
    sb.toString
  }

  /** One object element at indent `pad` — write_meta attribute order: id,
    * version?, timestamp?, (uid,user)?, changeset?, visible (history
    * documents only, xml.hpp:188-190); then node position lat before lon,
    * %.7f (xml.hpp:103-105); nd/member/tag children at pad+2.
    */
  private def writeObj(sb: StringBuilder, o: ChangeObj, pad: String,
                       history: Boolean): Unit = {
    val meta = new StringBuilder
    meta ++= s"""id="${o.id}""""
    if (o.version != 0) meta ++= s""" version="${o.version}""""
    if (o.tsIso.nonEmpty) meta ++= s""" timestamp="${esc(o.tsIso)}""""
    if (o.uid > 0) meta ++= s""" uid="${o.uid}" user="${esc(o.user)}""""
    if (o.changeset != 0) meta ++= s""" changeset="${o.changeset}""""
    if (history) meta ++= s""" visible="${o.visible}""""
    o.latLon.foreach { case (lat, lon) =>
      meta ++= f""" lat="$lat%.7f" lon="$lon%.7f""""
    }
    val cpad = pad + "  "
    val children = new StringBuilder
    o.nds.foreach(r => children ++= s"""$cpad<nd ref="$r"/>\n""")
    o.members.foreach { case (t, r, role) =>
      children ++= s"""$cpad<member type="${esc(t)}" ref="$r" role="${esc(role)}"/>\n"""
    }
    o.tags.foreach { case (k, v) =>
      children ++= s"""$cpad<tag k="${esc(k)}" v="${esc(v)}"/>\n"""
    }
    if (children.isEmpty) sb ++= s"$pad<${o.kind} $meta/>\n"
    else sb ++= s"$pad<${o.kind} $meta>\n$children$pad</${o.kind}>\n"
  }

  /** Plain .osm document (xml.hpp:70-92): `<osm>` root, optional
    * self-closed `<bounds>` header (minlon/minlat/maxlon/maxlat at %.7f —
    * the Meta bounds of osm/meta.hpp:34-89), objects in stream order with
    * NO op grouping. `history = true` models has_multiple_object_versions:
    * each object gains a visible attribute (the one meta attribute change
    * files suppress because their groups already carry it).
    */
  def osmXml(objs: Seq[ChangeObj], generator: String = "graft",
             bounds: Option[(Double, Double, Double, Double)] = None,
             history: Boolean = false): String = {
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\"?>\n"
    sb ++= s"""<osm version="0.6" generator="${esc(generator)}">\n"""
    bounds.foreach { case (minlon, minlat, maxlon, maxlat) =>
      sb ++= f"""  <bounds minlon="$minlon%.7f" minlat="$minlat%.7f" maxlon="$maxlon%.7f" maxlat="$maxlat%.7f"/>\n"""
    }
    objs.foreach(o => writeObj(sb, o, "  ", history))
    sb ++= "</osm>\n"
    sb.toString
  }

  /** Read a plain .osm document back into objects in document order — the
    * inverse of osmXml. `visible` comes from the history attribute when
    * present (plain documents default to true).
    */
  def parseOsm(xml: String): Seq[ChangeObj] = {
    val root = scala.xml.XML.loadString(xml)
    def attr(e: scala.xml.Node, a: String, dflt: String = ""): String = {
      val v = (e \ s"@$a").text; if (v.isEmpty) dflt else v
    }
    for {
      el <- root.child.toSeq if Seq("node", "way", "relation").contains(el.label)
    } yield {
      val latLon =
        if ((el \ "@lat").nonEmpty) Some((attr(el, "lat").toDouble, attr(el, "lon").toDouble))
        else None
      ChangeObj(el.label, attr(el, "id").toLong, attr(el, "version", "0").toInt,
        visible = attr(el, "visible", "true").toBoolean,
        attr(el, "timestamp"), attr(el, "uid", "0").toInt, attr(el, "user"),
        attr(el, "changeset", "0").toLong, latLon,
        (el \ "nd").map(nd => (nd \ "@ref").text.toLong),
        (el \ "member").map(m =>
          ((m \ "@type").text, (m \ "@ref").text.toLong, (m \ "@role").text)),
        (el \ "tag").map(t => ((t \ "@k").text, (t \ "@v").text)))
    }
  }
}
