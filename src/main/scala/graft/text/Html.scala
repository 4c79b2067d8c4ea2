package graft.text

import scala.collection.mutable

/** Minimal HTML tag-tree parser — just enough soup for the MediaWiki
  * diff-table walk (graft.text.DiffHtml): elements with ordered attributes,
  * text nodes, comments skipped, void/self-closing tags, tolerant close-tag
  * matching (an unmatched close pops to the nearest open ancestor of that
  * name, else is ignored). Pure Scala, no dependencies, usable inside typed
  * map stages.
  *
  * Semantics intentionally mirror the BeautifulSoup calls the reference makes
  * (/root/reference/src/wikidata_update/get_updates.py:199-358):
  *  - `findAll`/`find` search DESCENDANTS in document order (not self);
  *  - `getTextRaw` = `.text` / `get_text()`: concatenation of all descendant
  *    text nodes with no separator;
  *  - `getTextStripped` = `get_text(strip=True)`: each text node stripped,
  *    empties dropped, concatenated with no separator.
  */
object Html {

  sealed trait Node
  final case class TextNode(s: String) extends Node

  final case class Elem(
      name: String,
      attrList: Vector[(String, String)],
      children: Vector[Node]
  ) extends Node {

    def attr(key: String): Option[String] = attrList.collectFirst { case (k, v) if k == key => v }

    def classes: Set[String] =
      attr("class").map(s => Html.WsPat.split(s).filter(_.nonEmpty).toSet).getOrElse(Set.empty)

    /** Token membership in the class attribute. Semantics identical to
      * `classes.contains(c)` (tokens = runs between `\s+` separators), but
      * allocation-free: this is the hottest call of the diff-table walk
      * (several per td per row), and the regex-split + Set build was the
      * walk's dominant per-document cost.
      */
    def hasClass(c: String): Boolean = {
      if (c.isEmpty) return false
      var ai = 0
      while (ai < attrList.length) {
        if (attrList(ai)._1 == "class") {
          val s = attrList(ai)._2
          var i = 0
          val n = s.length
          while (i < n) {
            while (i < n && Html.isWs(s.charAt(i))) i += 1
            var j = i
            while (j < n && !Html.isWs(s.charAt(j))) j += 1
            if (j - i == c.length && s.regionMatches(i, c, 0, c.length)) return true
            i = j
          }
          return false // first class attribute wins, like attr()
        }
        ai += 1
      }
      false
    }

    /** All descendant elements (document order, self excluded). */
    def findAll(p: Elem => Boolean): Vector[Elem] = {
      val out = Vector.newBuilder[Elem]
      def walk(e: Elem): Unit = e.children.foreach {
        case c: Elem => if (p(c)) out += c; walk(c)
        case _       => ()
      }
      walk(this)
      out.result()
    }

    def find(p: Elem => Boolean): Option[Elem] = findAll(p).headOption

    /** `.text` / `get_text()`: all descendant strings concatenated. */
    def getTextRaw: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case TextNode(s) => sb.append(s)
        case e: Elem     => e.children.foreach(walk)
      }
      children.foreach(walk)
      sb.toString
    }

    /** `get_text(strip=True)`: each text node stripped, empties dropped. */
    def getTextStripped: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case TextNode(s) => val t = s.trim; if (t.nonEmpty) sb.append(t)
        case e: Elem     => e.children.foreach(walk)
      }
      children.foreach(walk)
      sb.toString
    }

    /** Copy of this element with the FIRST descendant matching `p` removed
      * (BeautifulSoup `tag.extract()` as used by remove_wb_details,
      * get_updates.py:421-424).
      */
    def removeFirst(p: Elem => Boolean): Elem = {
      var removed = false
      def walk(e: Elem): Elem =
        e.copy(children = e.children.flatMap {
          case c: Elem if !removed && p(c) => removed = true; None
          case c: Elem                     => Some(walk(c))
          case t                           => Some(t)
        })
      walk(this)
    }

    /** Re-serialization (BeautifulSoup `prettify()` stand-in for regex
      * searches over the tag's markup — attribute order preserved).
      */
    def outerHtml: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case TextNode(s) => sb.append(s)
        case e: Elem =>
          sb.append('<').append(e.name)
          e.attrList.foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(v).append('"') }
          sb.append('>')
          e.children.foreach(walk)
          sb.append("</").append(e.name).append('>')
      }
      walk(this)
      sb.toString
    }
  }

  /** Java-regex `\s` class ([ \t\n\x0B\f\r]) — the separator set of the
    * `split("\\s+")` the token scan above replaces.
    */
  private[text] def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' || ch == '\f' || ch == '\r'

  /** Compiled once: String.split(regex) recompiles the pattern per call. */
  private[text] val WsPat = java.util.regex.Pattern.compile("\\s+")

  private val Void = Set("br", "hr", "img", "input", "meta", "link", "col", "area", "base", "wbr")

  /** Parse a document/fragment into a synthetic `root` element. */
  def parse(html: String): Elem = {
    // stack of (name, attrs, children-so-far)
    val stack = mutable.Stack[(String, Vector[(String, String)], mutable.ArrayBuffer[Node])]()
    stack.push(("root", Vector.empty, mutable.ArrayBuffer.empty))

    def closeTop(): Unit = {
      val (n, a, ch) = stack.pop()
      stack.top._3 += Elem(n, a, ch.toVector)
    }

    var i = 0
    val len = html.length
    while (i < len) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) len else end + 3
        } else if (i + 1 < len && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i)
          i = if (end < 0) len else end + 1 // doctype / processing instruction
        } else {
          val end = html.indexOf('>', i)
          if (end < 0) { i = len }
          else {
            val raw = html.substring(i + 1, end).trim
            if (raw.startsWith("/")) {
              val name = raw.substring(1).trim.toLowerCase
              // pop to the matching open ancestor; ignore if none
              if (stack.exists(_._1 == name)) {
                while (stack.top._1 != name) closeTop()
                closeTop()
              }
            } else {
              val selfClose = raw.endsWith("/")
              val body = if (selfClose) raw.dropRight(1).trim else raw
              val nameEnd = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n')
              val name = (if (nameEnd < 0) body else body.substring(0, nameEnd)).toLowerCase
              val attrs = if (nameEnd < 0) Vector.empty else parseAttrs(body.substring(nameEnd))
              if (selfClose || Void(name)) stack.top._3 += Elem(name, attrs, Vector.empty)
              else stack.push((name, attrs, mutable.ArrayBuffer.empty))
            }
            i = end + 1
          }
        }
      } else {
        val next = html.indexOf('<', i)
        val stop = if (next < 0) len else next
        stack.top._3 += TextNode(unescape(html.substring(i, stop)))
        i = stop
      }
    }
    while (stack.length > 1) closeTop()
    val (n, a, ch) = stack.pop()
    Elem(n, a, ch.toVector)
  }

  // Hand-rolled equivalent of the original attribute regex
  //   ([a-zA-Z_:][a-zA-Z0-9_:.-]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s"'>]+))?
  // applied findAllMatchIn-style (scan forward, skip chars that cannot start
  // a match). The regex recompiled a Matcher and allocated groups per tag;
  // attribute parsing is the dominant cost of Html.parse on the diff-walk
  // hot path. HtmlSpec pins the behavior (quoted/unquoted/valueless attrs).
  private def nameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_' || c == ':'
  private def nameChar(c: Char): Boolean =
    nameStart(c) || (c >= '0' && c <= '9') || c == '.' || c == '-'

  private def parseAttrs(s: String): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && !nameStart(s.charAt(i))) i += 1
      if (i < n) {
        val ns = i
        i += 1
        while (i < n && nameChar(s.charAt(i))) i += 1
        val name = s.substring(ns, i)
        // \s* is consumed by the match whether or not a value follows
        var j = i
        while (j < n && isWs(s.charAt(j))) j += 1
        var value = ""
        var consumedTo = j
        if (j < n && s.charAt(j) == '=') {
          var k = j + 1
          while (k < n && isWs(s.charAt(k))) k += 1
          if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
            val q = s.charAt(k)
            val end = s.indexOf(q, k + 1)
            if (end >= 0) { value = s.substring(k + 1, end); consumedTo = end + 1 }
            // unterminated quote: the quoted alternative cannot match and the
            // unquoted one cannot start with a quote char → the optional
            // value group is skipped (valueless attr), like the regex
          } else if (k < n) {
            val vs = k
            var ke = k
            while (ke < n && { val c = s.charAt(ke); !isWs(c) && c != '"' && c != '\'' && c != '>' }) ke += 1
            if (ke > vs) { value = s.substring(vs, ke); consumedTo = ke }
          }
        }
        out += name -> unescape(value)
        i = consumedTo
      }
    }
    out.result()
  }

  private val NamedEntities: Map[String, String] = Map(
    "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "ndash" -> "–", "mdash" -> "—",
    "hellip" -> "…", "amp" -> "&")

  /** Entity decoding (BS4 parity): the named subset above plus decimal
    * (&#160;) and hex (&#x2019;) numeric character references — real
    * MediaWiki diff HTML uses numeric refs freely, and leaving them literal
    * would leak `&#...;` into emitted RDF literals. A malformed reference
    * (no ';' within 10 chars, or an unknown name / invalid code point)
    * passes through as literal text, like BS4's lenient parser.
    */
  private def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val decoded: Option[String] =
          if (semi < 0 || semi - i > 10) None
          else {
            val body = s.substring(i + 1, semi)
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(1)))))
              catch { case _: Exception => None }
            else NamedEntities.get(body)
          }
        decoded match {
          case Some(d) => out.append(d); i = semi + 1
          case None    => out.append(c); i += 1
        }
      }
    }
    out.toString
  }
}
