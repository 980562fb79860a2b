package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Config-driven tag-rule compiler — the engine counterpart of the
  * reference's scripted rule predicates:
  *
  *  - osm2shape build_func (reference/osmjs/js/osm2shape.js:126-160):
  *    `key` exists / `key=value` / `key=v1|v2|...` / `key=*`
  *  - Tags::KeyFilter / KeyValueFilter / RegexFilter rule chains with a
  *    first-match verdict and a default
  *    (reference/include/osmium/tags/key_filter.hpp:37-76,
  *    key_value_filter.hpp:37-78, regex_filter.hpp:40-84)
  *
  * Rules compile to Column expressions over a map<string,string> tags
  * column, so user configs become codegen'd Catalyst predicates instead of
  * per-row script callbacks.
  */
object TagRules {

  sealed trait Rule { def verdict: Boolean }
  /** key present (any value) — build_func `key` / `key=*`. */
  case class KeyExists(key: String, verdict: Boolean = true) extends Rule
  /** key = value — build_func `key=value`. */
  case class KeyValue(key: String, value: String, verdict: Boolean = true) extends Rule
  /** key in {v1..vn} — build_func `key=v1|v2|...`. */
  case class KeyIn(key: String, values: Seq[String], verdict: Boolean = true) extends Rule
  /** regex on the value of key — Tags::RegexFilter. */
  case class KeyValueRegex(key: String, pattern: String, verdict: Boolean = true) extends Rule

  private def matches(tags: Column, r: Rule): Column = r match {
    case KeyExists(k, _) => tags.getItem(k).isNotNull
    case KeyValue(k, v, _) => tags.getItem(k) === v
    case KeyIn(k, vs, _) => tags.getItem(k).isin(vs: _*)
    case KeyValueRegex(k, p, _) => tags.getItem(k).rlike(p)
  }

  /** Any-rule-matches predicate (osm2shape semantics: an object is kept if
    * any configured rule selects it).
    */
  def anyMatch(tags: Column, rules: Seq[Rule]): Column =
    rules.map(matches(tags, _)).reduceLeft(_ || _)

  /** First-match rule chain with default verdict (KeyFilter semantics:
    * rules are consulted in order, the first whose pattern matches decides;
    * otherwise the default applies). Compiles to a coalesced CASE chain.
    */
  def firstMatch(tags: Column, rules: Seq[Rule], default: Boolean): Column =
    rules.foldRight(lit(default): Column) { (r, acc) =>
      when(matches(tags, r), lit(r.verdict)).otherwise(acc)
    }

  /** Parse the osm2shape textual rule form: "key", "key=*", "key=value",
    * "key=v1|v2|v3" (osm2shape.js:126-160).
    */
  def parse(spec: String, verdict: Boolean = true): Rule =
    spec.split("=", 2) match {
      case Array(k) => KeyExists(k, verdict)
      case Array(k, "*") => KeyExists(k, verdict)
      case Array(k, v) if v.contains("|") => KeyIn(k, v.split("\\|").toSeq, verdict)
      case Array(k, v) => KeyValue(k, v, verdict)
    }
}
