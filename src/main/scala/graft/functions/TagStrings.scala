package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tag → string export formats — the engine counterpart of the reference's
  * TagToStringOp family (reference/include/osmium/tags/to_string.hpp:43-110,
  * goldens in reference/test/t/tags/test_to_string.cpp): a parameterized
  * formatter (escape set, prefix, infix, suffix, join) with the two stock
  * instances, plain `key=value` (no escaping) and PostgreSQL hstore
  * (`"k"=>"v"`, backslash-escaping `\` and `"`). These feed CSV/PostGIS
  * sinks, so they compile to plain Column expressions (replace/concat —
  * codegen'd) over a map<string,string> tags column.
  *
  * The reference formats tags in stored list order; a map column has none,
  * so entries are formatted in key-sorted order (deterministic for the
  * oracle and stable across engines).
  */
object TagStrings {

  /** Backslash-escape every character of `escape` occurring in `c`
    * (to_string.hpp:75-82). `\` is replaced first so escape backslashes are
    * never re-escaped — sequential replaces then equal the reference's
    * single char-by-char pass.
    */
  def escaped(c: Column, escape: String): Column =
    escape.distinct.sortBy(ch => if (ch == '\\') 0 else 1).foldLeft(c) {
      (acc, ch) => replace(acc, lit(ch.toString), lit("\\" + ch))
    }

  /** The parameterized formatter (TagToStringOp semantics). */
  def tagsToString(tags: Column, escape: String, prefix: String, infix: String,
                   suffix: String, join: String): Column =
    concat_ws(join, transform(array_sort(map_entries(tags)), e =>
      concat(lit(prefix), escaped(e.getField("key"), escape), lit(infix),
        escaped(e.getField("value"), escape), lit(suffix))))

  /** `key=value` joined by `join` — TagToKeyEqualsValueStringOp (no
    * escaping, to_string.hpp:89-97).
    */
  def tagsKeyEqualsValue(tags: Column, join: String): Column =
    tagsToString(tags, "", "", "=", "", join)

  /** PostgreSQL hstore literal — TagToHStoreStringOp
    * (to_string.hpp:102-110).
    */
  def tagsHstore(tags: Column): Column =
    tagsToString(tags, "\\\"", "\"", "\"=>\"", "\"", ",")
}
