package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** Single-pass implementation of the reference's sequential 26-URI prefix
  * replace (ttl_compare.py:287-299). The sequential-replace semantics are
  * reproduced by trying dictionary entries in dict order at each position
  * and taking the first match (equivalent because every entry starts with
  * "http" and no entry contains "http" past position 0, so matches of
  * different entries can only compete at the same start position — where
  * pass order picks the earliest dict entry; pinned by the randomized
  * equivalence property in SparqlFormatSpec).
  *
  * One pass, one output buffer — versus 26 full scans + copies for the
  * replace chain. Candidate checks trigger only at 'h' characters.
  */
object PrefixTrie {

  private val entries: Array[(String, String)] =
    SparqlFormat.prefixes.map { case (uri, p) => (uri, p + ":") }.toArray

  def replaceAll(s: String): String = {
    var i = 0
    val n = s.length
    var sb: java.lang.StringBuilder = null // lazily allocated — most strings have no match
    while (i < n) {
      val c = s.charAt(i)
      if (c == 'h') {
        var e = 0
        var matched = -1
        while (matched < 0 && e < entries.length) {
          if (s.startsWith(entries(e)._1, i)) matched = e
          e += 1
        }
        if (matched >= 0) {
          if (sb == null) { sb = new java.lang.StringBuilder(n); sb.append(s, 0, i) }
          sb.append(entries(matched)._2)
          i += entries(matched)._1.length
        } else {
          if (sb != null) sb.append(c)
          i += 1
        }
      } else {
        if (sb != null) sb.append(c)
        i += 1
      }
    }
    if (sb == null) s else sb.toString
  }

  /** UTF8String entry point for codegen (static forwarder callable from
    * Janino-generated Java).
    */
  def replaceAllUTF8(u: UTF8String): UTF8String =
    UTF8String.fromString(replaceAll(u.toString))
}
