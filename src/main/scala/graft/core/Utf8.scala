package graft.core

/** UTF-8-safe truncation — reference semantics from the shapefile sink
  * (reference/include/osmium/export/shapefile.hpp:263-282): cut a string to
  * a byte budget without ever splitting a multi-byte character.
  */
object Utf8 {

  /** Longest prefix of `s` whose UTF-8 encoding is <= maxBytes. */
  def safeTruncate(s: String, maxBytes: Int): String = {
    var bytes = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
      if (bytes + n > maxBytes) return s.substring(0, i)
      bytes += n
      i += Character.charCount(cp)
    }
    s
  }

  def byteLen(s: String): Int = s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
}
