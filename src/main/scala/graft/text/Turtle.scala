package graft.text

import graft.model.Triple

/** Minimal Turtle subset parser — the slice of rdflib's parser the reference
  * actually exercises (/root/reference/src/wikidata_update/ttl_compare.py:
  * 168-183 parses full entity dumps; the committed test fixtures use
  * `@prefix` declarations + one-triple-per-statement lines with prefixed
  * names, full URIs, blank nodes and literals with optional `@lang` /
  * `^^datatype`).
  *
  * Supported grammar:
  *   @prefix ns: <uri> .
  *   subject predicate object .        (one or more, `;`-chains expanded)
  * Terms: `<uri>` | `ns:local` | `_:bnode` | `"literal"` [@lang | ^^dt].
  *
  * Output triples carry FULL URIs (prefixes expanded) like rdflib, so the
  * downstream prefix-replacement operator (SparqlFormat.replacePrefixes)
  * does the same work it does in the reference.
  */
object Turtle {

  final case class Term(lex: String, lang: Option[String], dtype: Option[String], kind: String)

  def parse(ttl: String): Set[Triple] = {
    val prefixMap = scala.collection.mutable.Map[String, String]()
    val triples = scala.collection.mutable.Set[Triple]()

    // statement-split on '.' at end of logical line (fixtures are line-oriented)
    val statements = tokenizeStatements(ttl)
    statements.foreach { st =>
      val trimmed = st.trim
      if (trimmed.isEmpty) ()
      else if (trimmed.startsWith("@prefix")) {
        val m = """@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]*)>""".r.findFirstMatchIn(trimmed)
        m.foreach(mm => prefixMap(mm.group(1)) = mm.group(2))
      } else {
        val terms = tokenizeTerms(trimmed)
        if (terms.length >= 3) {
          // expand `s p o ; p2 o2 ; ...` chains
          val subj = resolve(terms.head, prefixMap)
          var idx = 1
          while (idx + 1 < terms.length) {
            val p = resolve(terms(idx), prefixMap)
            val o = resolveObj(terms(idx + 1), prefixMap)
            triples += Triple(subj.lex, p.lex, o.lex, o.lang, o.dtype, o.kind)
            idx += 2
          }
        }
      }
    }
    triples.toSet
  }

  /** Split on '.' terminators that are outside quoted strings and URIs. */
  private def tokenizeStatements(ttl: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var inQuote = false
    var inUri = false
    while (i < ttl.length) {
      val c = ttl.charAt(i)
      if (c == '"' && (i == 0 || ttl.charAt(i - 1) != '\\')) inQuote = !inQuote
      else if (!inQuote && c == '<') inUri = true
      else if (!inQuote && c == '>') inUri = false
      if (c == '.' && !inQuote && !inUri &&
          (i + 1 >= ttl.length || ttl.charAt(i + 1).isWhitespace)) {
        out += cur.toString; cur.clear()
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** Split one statement into term tokens, `;` expanded to keep (p,o) pairs. */
  private def tokenizeTerms(st: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val s = st.replace(";", " ; ")
    var subject: String = null
    val raw = Vector.newBuilder[String]
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val sb = new StringBuilder("\"")
        i += 1
        while (i < s.length && !(s.charAt(i) == '"' && s.charAt(i - 1) != '\\')) {
          sb.append(s.charAt(i)); i += 1
        }
        sb.append('"'); i += 1
        // attach @lang or ^^dt suffix
        while (i < s.length && !s.charAt(i).isWhitespace) { sb.append(s.charAt(i)); i += 1 }
        raw += sb.toString
      } else if (c == '<') {
        val end = s.indexOf('>', i)
        raw += s.substring(i, end + 1); i = end + 1
      } else {
        val sb = new StringBuilder
        while (i < s.length && !s.charAt(i).isWhitespace) { sb.append(s.charAt(i)); i += 1 }
        raw += sb.toString
      }
    }
    val toks = raw.result()
    if (toks.isEmpty) return Vector.empty
    subject = toks.head
    out += subject
    var j = 1
    while (j < toks.length) {
      if (toks(j) == ";") { j += 1 } // next (p,o) pair continues same subject
      else { out += toks(j); j += 1 }
    }
    out.result()
  }

  private def resolve(tok: String, pfx: scala.collection.Map[String, String]): Term = {
    if (tok.startsWith("<") && tok.endsWith(">"))
      Term(tok.substring(1, tok.length - 1), None, None, "uri")
    else if (tok.startsWith("_:")) Term(tok, None, None, "bnode")
    else if (tok == "a") Term("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", None, None, "uri")
    else {
      val colon = tok.indexOf(':')
      if (colon >= 0) {
        val ns = tok.substring(0, colon)
        pfx.get(ns) match {
          case Some(base) => Term(base + tok.substring(colon + 1), None, None, "uri")
          case None       => Term(tok, None, None, "prefixed")
        }
      } else Term(tok, None, None, "prefixed")
    }
  }

  private def resolveObj(tok: String, pfx: scala.collection.Map[String, String]): Term = {
    if (tok.startsWith("\"")) {
      val close = closingQuote(tok)
      val body = tok.substring(1, close).replace("\\\"", "\"")
      val rest = tok.substring(close + 1)
      if (rest.startsWith("@")) Term(body, Some(rest.substring(1)), None, "literal")
      else if (rest.startsWith("^^")) {
        val dt = resolve(rest.substring(2), pfx)
        Term(body, None, Some(dt.lex), "literal")
      } else Term(body, None, None, "literal")
    } else resolve(tok, pfx)
  }

  private def closingQuote(tok: String): Int = {
    var i = 1
    while (i < tok.length) {
      if (tok.charAt(i) == '"' && tok.charAt(i - 1) != '\\') return i
      i += 1
    }
    tok.length - 1
  }
}
