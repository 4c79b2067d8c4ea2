package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Mention, Page}
import graft.text.AhoCorasick

/** Mention detection: one Aho-Corasick pass per page over a broadcast trie —
  * the batched replacement for the reference's per-entity HTTP loop
  * (/root/reference/src/wikidata_update/get_updates.py:1166-1168). The trie
  * is built once on the driver and shipped via Broadcast, so dictionary cost
  * is O(1) per executor regardless of page count; scanning is
  * O(text + matches) per page, embarrassingly parallel, no shuffle.
  */
object Mentions {

  /** flatMap pages → mentions (the Generator/UDTF role done idiomatically —
    * SURVEY.md §2.9). `wordBounds=true` is the pipeline semantic; `false`
    * gives raw substring occurrences (the SQL-oracle-checkable semantic).
    */
  def scan(
      spark: SparkSession,
      pages: Dataset[Page],
      surfaces: Seq[String],
      wordBounds: Boolean = true
  ): Dataset[Mention] = {
    import spark.implicits._
    val trie = spark.sparkContext.broadcast(AhoCorasick.build(surfaces))
    pages.flatMap { p =>
      trie.value.scan(p.text, wordBounds).map { m =>
        Mention(p.url, m.pattern, m.begin, m.end, p.lang)
      }
    }
  }
}
