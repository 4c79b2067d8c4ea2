package graft.model

/** Committed broadcast dictionaries (FIXTURES.md §2) — the local stand-in for
  * the Wikidata label/alias dump the production pipeline would broadcast.
  * Surfaces are drawn from the synthetic corpus vocabulary; "scan" is the
  * deliberate skewed head surface, and "table" is deliberately ambiguous
  * (two QIDs with distinct priors) to exercise top-k candidate ranking.
  *
  * Shapes mirror the labels/aliases maps of the reference's entity JSON
  * (/root/reference/src/wikidata_update/new_entity_rdf.py:61-71).
  */
object Dict {

  val aliases: Seq[Alias] = Seq(
    Alias("spark", "Q1001", "en", 0.90),
    Alias("scan", "Q1002", "en", 0.95), // head surface (skew driver)
    Alias("hash join", "Q1003", "en", 0.92),
    Alias("table scan", "Q1004", "en", 0.88),
    Alias("merge", "Q1005", "en", 0.80),
    Alias("customer", "Q1006", "en", 0.91),
    Alias("vector", "Q1007", "en", 0.89),
    Alias("window", "Q1008", "en", 0.87),
    Alias("stream", "Q1009", "en", 0.86),
    Alias("filter", "Q1010", "en", 0.93),
    Alias("query", "Q1011", "en", 0.94),
    Alias("table", "Q1013", "en", 0.70), // ambiguous surface, winner
    Alias("table", "Q1014", "en", 0.30), // ambiguous surface, runner-up
    Alias("batch", "Q1015", "en", 0.81),
    Alias("hash", "Q1016", "en", 0.76),
    Alias("join", "Q1017", "en", 0.83),
    Alias("sort", "Q1018", "en", 0.84),
    Alias("column", "Q1019", "en", 0.85),
    Alias("group", "Q1020", "en", 0.79),
    Alias("order", "Q1021", "en", 0.78)
  )

  /** Distinct surfaces for the mention scanner. */
  val surfaces: Seq[String] = aliases.map(_.surface).distinct

  /** Property dictionary: relation name → PID (mirrors `Property:P…` href
    * extraction, get_updates.py:883-916).
    */
  val properties: Map[String, String] = Map(
    "cooccurs_with" -> "P1001",
    "followed_by" -> "P1002",
    "mentions" -> "P1003"
  )
}
