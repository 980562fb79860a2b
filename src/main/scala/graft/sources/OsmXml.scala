package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.FixedPoint

/** Test-fixture loader for reference `.osm` XML files (SURVEY.md §2.1: a
  * small reader producing the entity Datasets — NOT a production path; the
  * production plane reads Parquet/Iceberg). Schema follows the reference
  * data model (reference/include/osmium/osm/object.hpp:296-305,
  * node.hpp:42, way.hpp:41, relation.hpp:69) with fixed-point coordinates
  * (position.hpp:35-45).
  */
object OsmXml {

  case class ONode(id: Long, version: Int, tsIso: String, uid: Int, user: String,
                   changeset: Int, visible: Boolean, tags: Map[String, String],
                   lon_fix: Int, lat_fix: Int)
  case class OWay(way_id: Long, version: Int, tsIso: String, visible: Boolean,
                  tags: Map[String, String], refs: Array[Long])
  case class OMember(mtype: String, ref: Long, role: String)
  case class ORelation(rel_id: Long, version: Int, tsIso: String, visible: Boolean,
                       tags: Map[String, String], members: Array[OMember])

  /** Maximum OSM username/role BYTE length. The reference's documented
    * limit is 255 UTF-8 characters, but its enforced check is
    * `strlen(user) > 255*4+1` — a byte bound of 1021 (reference/include/
    * osmium/osm/object.hpp:51,185-193, relation_member.hpp:45-49,87-89:
    * throw std::length_error + reset to ""). The engine mirrors the CODE,
    * not the comment: values over 1021 UTF-8 bytes map to "" (so a
    * 300-character ASCII name passes here exactly as it does in the
    * reference).
    */
  val MaxNameBytes = 255 * 4 + 1

  def capName(s: String): String =
    if (s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length > MaxNameBytes) ""
    else s

  def parse(path: String): (Seq[ONode], Seq[OWay], Seq[ORelation]) = {
    val root = scala.xml.XML.loadFile(path)
    def tags(e: scala.xml.Node): Map[String, String] =
      (e \ "tag").map(t => ((t \ "@k").text, (t \ "@v").text)).toMap
    def attr(e: scala.xml.Node, a: String, dflt: String = ""): String = {
      val v = (e \ s"@$a").text; if (v.isEmpty) dflt else v
    }
    val nodes = (root \ "node").map { e =>
      ONode(attr(e, "id").toLong, attr(e, "version", "0").toInt, attr(e, "timestamp"),
        attr(e, "uid", "-1").toInt, capName(attr(e, "user")), attr(e, "changeset", "0").toInt,
        attr(e, "visible", "true").toBoolean, tags(e),
        FixedPoint.doubleToFix(attr(e, "lon", "0").toDouble),
        FixedPoint.doubleToFix(attr(e, "lat", "0").toDouble))
    }
    val ways = (root \ "way").map { e =>
      OWay(attr(e, "id").toLong, attr(e, "version", "0").toInt, attr(e, "timestamp"),
        attr(e, "visible", "true").toBoolean, tags(e),
        (e \ "nd").map(nd => (nd \ "@ref").text.toLong).toArray)
    }
    val rels = (root \ "relation").map { e =>
      ORelation(attr(e, "id").toLong, attr(e, "version", "0").toInt, attr(e, "timestamp"),
        attr(e, "visible", "true").toBoolean, tags(e),
        (e \ "member").map(m =>
          OMember((m \ "@type").text, (m \ "@ref").text.toLong, capName((m \ "@role").text))).toArray)
    }
    (nodes, ways, rels)
  }

  def frames(spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val (n, w, r) = parse(path)
    (n.toDF(), w.toDF(), r.toDF())
  }
}
