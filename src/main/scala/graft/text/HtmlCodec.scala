package graft.text

/** Deterministic HTML page synthesis + the byte-identity extractor.
  *
  * Contract (SURVEY.md §7.3, BASELINE.json input_hint): the `html` column is
  * generated *from* `text` by deterministic tag-wrapping + entity escaping,
  * and `extract(generate(url, text)) == text` must hold byte-for-byte per
  * url. The extractor follows the reference's BeautifulSoup `get_text()`
  * semantics (/root/reference/src/wikidata_update/get_updates.py:250,302,447):
  * concatenate body text nodes, drop markup / script / style / comments,
  * entity-unescape, add no whitespace of its own.
  *
  * Both functions are pure and allocation-lean so they run inside
  * `mapPartitions` on the hot path without breaking whole-stage codegen of
  * surrounding stages.
  */
object HtmlCodec {

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Stable per-url seed (murmur-ish mix of the url chars; no randomness —
    * determinism is part of the fixture contract).
    */
  private def seedOf(url: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < url.length) { h = 31 * h + url.charAt(i); i += 1 }
    h
  }

  /** Synthesizes a realistic-ish page: head with title (outside the extracted
    * region), seeded decoration — comments, a script, nested spans — and the
    * text split across paragraph tags with NO inter-tag whitespace inside
    * body, so text nodes concatenate back to exactly `text`.
    */
  def generate(url: String, text: String): Array[Byte] = {
    val seed = seedOf(url)
    val sb = new StringBuilder(text.length * 2 + 256)
    sb.append("<!DOCTYPE html><html><head><title>")
    sb.append(escape(url))
    sb.append("</title><style>body{margin:0}</style>")
    sb.append("<script>var page_id=").append(seed & 0xffff).append(";</script>")
    sb.append("</head><body>")
    // split text into 1-4 chunks, seeded by url
    val n = if (text.isEmpty) 0 else (1 + (math.abs(seed) % 4)).toInt
    if (n == 0) ()
    else {
      val step = math.max(1, text.length / n)
      var pos = 0
      var k = 0
      while (pos < text.length) {
        val end = if (k == n - 1) text.length else math.min(text.length, pos + step)
        val chunk = text.substring(pos, end)
        k % 3 match {
          case 0 => sb.append("<p class=\"c").append(k).append("\">").append(escape(chunk)).append("</p>")
          case 1 => sb.append("<div><span>").append(escape(chunk)).append("</span></div>")
          case 2 => sb.append("<!-- seg ").append(k).append(" --><section>").append(escape(chunk)).append("</section>")
        }
        pos = end
        k += 1
        if (pos >= text.length) () // done
      }
    }
    sb.append("<script>trk(").append(seed % 97).append(");</script>")
    sb.append("</body></html>")
    sb.toString.getBytes("UTF-8")
  }

  /** Single-pass state machine: body-scoped text-node concatenation with
    * script/style/comment exclusion, then entity unescape. Inverts
    * `generate` exactly; on arbitrary HTML it approximates get_text().
    */
  def extract(html: Array[Byte]): String = {
    val s = new String(html, "UTF-8")
    val sb = new StringBuilder(s.length)
    var i = 0
    var inBody = false
    var skipUntil: String = null // closing tag (lowercase) we must reach before resuming
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (c == '<') {
        if (i + 3 < len && s.charAt(i + 1) == '!' && s.charAt(i + 2) == '-' && s.charAt(i + 3) == '-') {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) len else end + 3
        } else {
          val end = s.indexOf('>', i)
          if (end < 0) { i = len }
          else {
            val tag = s.substring(i + 1, end)
            val closing = tag.startsWith("/")
            val base = (if (closing) tag.substring(1) else tag)
              .takeWhile(ch => ch != ' ' && ch != '/' && ch != '\t').toLowerCase
            val name = if (closing) "/" + base else base
            name match {
              case "body"                  => inBody = true
              case "/body"                 => inBody = false
              case "script" | "style"      => skipUntil = "/" + name
              case n if skipUntil != null && n == skipUntil => skipUntil = null
              case _                       => ()
            }
            i = end + 1
          }
        }
      } else {
        if (inBody && skipUntil == null) sb.append(c)
        i += 1
      }
    }
    unescape(sb.toString)
  }

  private def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 6) {
          s.substring(i + 1, semi) match {
            case "amp"  => sb.append('&'); i = semi + 1
            case "lt"   => sb.append('<'); i = semi + 1
            case "gt"   => sb.append('>'); i = semi + 1
            case "quot" => sb.append('"'); i = semi + 1
            case "apos" => sb.append('\''); i = semi + 1
            case _      => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
