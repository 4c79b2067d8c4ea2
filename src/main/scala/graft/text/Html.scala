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
      attr("class").map(_.split("\\s+").filter(_.nonEmpty).toSet).getOrElse(Set.empty)

    def hasClass(c: String): Boolean = classes.contains(c)

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

  private val AttrPat = """([a-zA-Z_:][a-zA-Z0-9_:.-]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s"'>]+))?""".r

  private def parseAttrs(s: String): Vector[(String, String)] =
    AttrPat.findAllMatchIn(s).map { m =>
      val v =
        if (m.group(3) != null) m.group(3)
        else if (m.group(4) != null) m.group(4)
        else if (m.group(2) != null) m.group(2)
        else ""
      m.group(1) -> unescape(v)
    }.toVector

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
