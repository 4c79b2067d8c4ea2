package graft.text

/** Deterministic MediaWiki-diff-table fixture generator (the DiffHtml
  * counterpart of HtmlCodec.generate): builds a reference-shaped diff
  * document whose expected convert_to_rdf output is a closed-form function of
  * (userId, eventId) — which is what makes q44's DuckDB oracle expressible.
  *
  * Shapes mirror the diff tables convert_to_rdf consumes
  * (/root/reference/src/wikidata_update/get_updates.py:191-358): row classes
  * diff-lineno / diff-deletedline / diff-addedline, `del`/`ins` diffchange
  * cells, `/wiki/Property:P…` predicate anchors, nested span pairs, a
  * wb-details sub-table to exercise the strip, and the four predicate
  * families (schema label, qualifier, rank, whole-claim add).
  */
object DiffHtmlGen {

  /** One four-section diff document for entity Q<userId>:
    *  A. schema `label / en` edit (deleted + added flat lines)
    *  C. qualifier add via a nested (a, b.wb-time-rendered) span pair,
    *     with a wb-details noise table that must be stripped
    *  D. rank removal (flat, camel-cased)
    *  B. whole-claim add (`ps:` family → handle_claim_updates + ?statement
    *     substitution with the minted statement id)
    *
    * Expected output blocks (5 per document) are derived in
    * Queries.q44Sql / DiffHtmlSpec.
    */
  def generate(userId: Long, eventId: Long): String = {
    val sb = new StringBuilder(2048)
    sb.append("<table class=\"diff\">")
    // ---- A: schema label edit
    sb.append("<tr><td class=\"diff-lineno\">label / en</td></tr>")
    sb.append("<tr><td class=\"diff-deletedline\"><div><del class=\"diffchange\">old label ")
      .append(eventId).append("</del></div></td></tr>")
    sb.append("<tr><td class=\"diff-addedline\"><div><ins class=\"diffchange\">new label ")
      .append(eventId).append("</ins></div></td></tr>")
    // ---- C: qualifier add (nested span pair + wb-details noise)
    sb.append("<tr><td class=\"diff-lineno\">Property / <a href=\"/wiki/Property:P39\">position held</a> / qualifier</td></tr>")
    sb.append("<tr><td class=\"diff-addedline\"><div><ins class=\"diffchange\">")
      .append("<span><a href=\"/wiki/Property:P585\">point in time</a>: <b class=\"wb-time-rendered\">time ")
      .append(eventId).append("</b>")
      .append("<table class=\"wb-details wb-time-details\"><tr><td>calendar</td><td>gregorian</td></tr></table>")
      .append("</span></ins></div></td></tr>")
    // ---- D: rank removal
    sb.append("<tr><td class=\"diff-lineno\">Property / <a href=\"/wiki/Property:P39\">position held</a> / rank</td></tr>")
    sb.append("<tr><td class=\"diff-deletedline\"><div><del class=\"diffchange\"><span>normal rank</span></del></div></td></tr>")
    // ---- B: whole-claim add
    sb.append("<tr><td class=\"diff-lineno\">Property / <a href=\"/wiki/Property:P31\">instance of</a></td></tr>")
    sb.append("<tr><td class=\"diff-addedline\"><div><ins class=\"diffchange\">")
      .append("<a href=\"https://www.wikidata.org/wiki/Q5\">human ").append(eventId).append("</a>")
      .append("</ins></div></td></tr>")
    sb.append("</table>")
    sb.toString
  }

  /** Reference-time section: a prov/references diff whose time-rendered
    * object must resolve from the paired entity JSON — exercises
    * getDatetimeObject and (with specific=true) the v:-node mint + TimeValue
    * block emission. Shape per get_updates.py:575-628.
    */
  def generateReferenceTime(eventId: Long): String =
    "<table class=\"diff\">" +
      "<tr><td class=\"diff-lineno\">Property / <a href=\"/wiki/Property:P39\">position held</a> / reference</td></tr>" +
      "<tr><td class=\"diff-addedline\"><div><ins class=\"diffchange\">" +
      "<span><a href=\"/wiki/Property:P813\">retrieved</a> <b class=\"wb-time-rendered\">rendered " +
      eventId + "</b></span></ins></div></td></tr>" +
      "</table>"

  /** Matching wbgetentities document: one P39 claim whose single reference
    * carries a P813 time snak (the navigation target of
    * get_datetime_object, get_updates.py:710-722).
    */
  def entityJsonWithRefTime(entityId: String, time: String): String =
    s"""{"entities":{"$entityId":{"claims":{"P39":[{"references":[{"hash":"h0",""" +
      s""""snaks":{"P813":[{"datavalue":{"value":{"time":"$time","precision":11,""" +
      s""""timezone":0,"calendarmodel":"http://www.wikidata.org/entity/Q1985727"}}}]}}]}]}}}}"""
}
