package graft.text

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** C10 — driver-side argument/date validation, ported 1:1 from
  * /root/reference/src/wikidata_update/get_updates.py:961-1074 (same logic
  * at sparql_updates.py:159-310), including the reference's exclusive-range
  * quirks: Python `range(1, 12)` admits months 1..11 only (December is
  * rejected), `range(1, 31)` admits days 1..30, `range(1000, 9999)` years
  * 1000..9998 — preserved verbatim because the P/R contract is against
  * reference behavior, not the calendar.
  */
object Validate {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Positional format check + 1-month-recency window vs `now`. */
  def verifyDate(date: String, now: LocalDateTime): Boolean = {
    def num(a: Int, b: Int): Option[Int] =
      try Some(date.substring(a, b).toInt) catch { case _: Exception => None }
    val shapeOk =
      date != null && date.length == 19 &&
        date.charAt(10) == ' ' && date.charAt(13) == ':' && date.charAt(16) == ':' &&
        date.charAt(4) == '-' && date.charAt(7) == '-' &&
        num(0, 4).exists(y => y >= 1000 && y <= 9998) &&
        num(5, 7).exists(m => m >= 1 && m <= 11) &&
        num(8, 10).exists(d => d >= 1 && d <= 30) &&
        num(11, 13).exists(h => h >= 0 && h <= 23) &&
        num(14, 16).exists(mi => mi >= 0 && mi <= 59) &&
        num(17, 19).exists(s => s >= 0 && s <= 59)
    if (!shapeOk) false
    else {
      val d = LocalDateTime.parse(date, fmt)
      !d.isBefore(now.minusMonths(1)) && !d.isAfter(now)
    }
  }

  final case class RunArgs(
      latest: Boolean = false,
      start: Option[String] = None,
      end: Option[String] = None,
      changeType: Option[String] = None,
      file: Option[String] = None,
      number: Option[String] = None,
      id: Option[String] = None
  )

  /** verify_args port (get_updates.py:961-1044): returns an error message or
    * None when valid.
    */
  def verifyArgs(a: RunArgs, now: LocalDateTime): Option[String] = {
    if (a.latest && (a.start.isDefined || a.end.isDefined))
      return Some("Cannot set latest and start or end date at the same time.")
    if (a.start.isDefined != a.end.isDefined)
      return Some("Cannot set start date without end date.")
    a.changeType.foreach { t =>
      if (!Set("edit|new", "edit", "new").contains(t))
        return Some("Invalid type argument.")
    }
    a.file.foreach { f =>
      if (!f.endsWith(".ttl") && !f.endsWith(".txt"))
        return Some("Invalid file name.")
    }
    a.number.foreach { n =>
      val ok = try { val v = n.toInt; v >= 1 && v <= 500 } catch { case _: Exception => false }
      if (!ok) return Some("Invalid number argument.")
    }
    a.id.foreach { id =>
      if (!(id.startsWith("Q") && id.drop(1).nonEmpty && id.drop(1).forall(_.isDigit)))
        return Some("Invalid entity argument.")
    }
    for (s <- a.start) if (!verifyDate(s, now)) return Some("Invalid start date argument.")
    for (e <- a.end) if (!verifyDate(e, now)) return Some("Invalid end date argument.")
    (a.start, a.end) match {
      case (Some(s), Some(e)) if LocalDateTime.parse(e, fmt).isBefore(LocalDateTime.parse(s, fmt)) =>
        Some("Start date cannot be later than end date.")
      case _ => None
    }
  }
}
