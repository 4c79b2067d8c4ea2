package graft.text

/** F8 — the reference's mention→term extractor over markup fragments:
  * `extract_href` (/root/reference/src/wikidata_update/get_updates.py:
  * 883-916). Given one diff-cell tag fragment, produce the canonical term:
  * Property href → PID; /wiki/Q… href → `wd:Q…`; title attr → PID; `P:`
  * text → PID; rendered time/quantity <b> → quoted text; else quoted,
  * quote-escaped plain text. Pure function over a fragment string (our
  * equivalent of the BeautifulSoup tag), usable inside typed maps.
  */
object HrefExtract {

  private val ATag = """(?s)<a\b([^>]*)>(.*?)</a>""".r
  private val BTag = """(?s)<b\b([^>]*class="[^"]*(?:wb-time-rendered|wb-quantity-rendered)[^"]*"[^>]*)>(.*?)</b>""".r
  private val Attr = """([a-zA-Z-]+)\s*=\s*"([^"]*)"""".r

  private def attrs(s: String): Map[String, String] =
    Attr.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap

  private def stripTags(s: String): String =
    s.replaceAll("<[^>]*>", "")

  private def quoted(text: String): String =
    "\"" + text.trim.replace("\"", "\\\"") + "\""

  /** `tagAttrs` are the outer tag's own attributes (BeautifulSoup `tag`);
    * `inner` is its inner HTML. If the fragment IS an <a>/<b> tag, pass its
    * attributes and text directly (matches get_updates.py:887-890).
    */
  def extract(tagAttrs: Map[String, String], inner: String): String = {
    val a = ATag.findFirstMatchIn(inner).map(m => (attrs(m.group(1)), m.group(2)))
    val b = BTag.findFirstMatchIn(inner).map(m => stripTags(m.group(2)))
    val text = stripTags(inner)

    a.flatMap { case (aa, _) => aa.get("href") } match {
      case Some(href) if href.contains("Property:") =>
        return href.split("Property:", 2)(1)
      case Some(href) if href.startsWith("/wiki/Q") =>
        return "wd:" + href.split("/")(2)
      case _ => ()
    }
    tagAttrs.get("title") match {
      case Some(t) if t.contains("Property:") => return t.split("Property:", 2)(1)
      case _ => ()
    }
    if (text.contains("P:")) return text.split("P:", 2)(1).trim
    b match {
      case Some(bText) => quoted(bText)
      case None        => quoted(text)
    }
  }

  /** C12/A1 — the nested-tag pairing walk of handle_nested
    * (get_updates.py:575-628), network lookups replaced by the supplied
    * `refHash` (deterministically minted upstream — SURVEY.md §7.4 J3/J4):
    * fragments alternate (predicate, object); odd tails drop (the reference
    * indexes i, i+1 stepping by 2 and its callers pre-trim odd counts);
    * emitted statement shape depends on the predicate family:
    *  - prov:wasDerivedFrom → `ref:<hash> pr:<p> <o>` + reference typing
    *  - qualifier           → `?statement pq:<p> <o>`
    *  - ps:…                → single `?statement <p> <o>` from fragment 0
    *  - otherwise           → `wd:<entity> ps:<p> <o>`
    */
  def handleNested(
      fragments: Seq[String],
      currentPredicate: String,
      entityId: String,
      refHash: Option[String]
  ): String = {
    if (currentPredicate.startsWith("ps:")) {
      val obj = extractFragment(fragments.head)
      return s"  ?statement $currentPredicate $obj ."
    }
    val (prefix, header) = currentPredicate match {
      case "prov:wasDerivedFrom" =>
        val h = refHash.getOrElse("")
        ("pr",
          s"  ?statement $currentPredicate ref:$h .\n" +
            s"  ref:$h a wikibase:Reference .\n")
      case "qualifier" => ("pq", "")
      case _           => ("ps", "")
    }
    val sb = new StringBuilder(header)
    fragments.grouped(2).foreach {
      case Seq(p, o) =>
        val pred = extractFragment(p)
        val obj = extractFragment(o)
        if (currentPredicate == "prov:wasDerivedFrom")
          sb.append(s"  ref:${refHash.getOrElse("")} $prefix:$pred $obj .\n")
        else if (currentPredicate == "qualifier")
          sb.append(s"  ?statement $prefix:$pred $obj .\n")
        else
          sb.append(s"  wd:$entityId $prefix:$pred $obj .\n")
      case _ => () // odd tail dropped, matching the reference's 2-step walk
    }
    sb.toString
  }

  /** Convenience for whole-fragment input: parses the outermost tag. */
  def extractFragment(fragment: String): String = {
    val outer = """(?s)^\s*<([a-zA-Z]+)\b([^>]*)>(.*)</\1>\s*$""".r
    fragment match {
      case outer(name, attrStr, inner) =>
        val ownAttrs = attrs(attrStr)
        if (name == "a") {
          // the fragment itself is the anchor (get_updates.py:887-888)
          extract(ownAttrs, s"<a${attrStr}>$inner</a>")
        } else if (name == "b") {
          extract(ownAttrs, s"<b${attrStr}>$inner</b>")
        } else extract(ownAttrs, inner)
      case _ => quoted(stripTags(fragment))
    }
  }
}
