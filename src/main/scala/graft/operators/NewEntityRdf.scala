package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A3 — new-entity INSERT synthesis: fold one entity document (labels +
  * descriptions + aliases + typed claims) into a single multi-line
  * `INSERT DATA { … };` block with `;`-chained predicates — semantics ported
  * from /root/reference/src/wikidata_update/new_entity_rdf.py:54-116
  * (6-way datavalue.type dispatch at 81-108, trailing `;`→`.` fixup at 111).
  *
  * Two forms:
  *  - `render`: pure Scala golden-anchor (unit-tested against the reference
  *    output grammar);
  *  - `fromJson`: the distributed form — `from_json` with an explicit schema
  *    (J5/J6 navigation), explode each facet, per-type `when` dispatch,
  *    groupBy(entity) + ordered concat. All Catalyst built-ins (codegen'd);
  *    the per-entity grouping is the only shuffle.
  */
object NewEntityRdf {

  final case class Claim(pid: String, dtype: String, value: String, lang: String)
  final case class EntityDoc(
      id: String,
      labels: Seq[(String, String)], // (lang, value)
      descriptions: Seq[(String, String)],
      aliases: Seq[(String, String)],
      claims: Seq[Claim]
  )

  /** Pure renderer — byte-faithful to new_entity_rdf.py's block grammar. */
  def render(e: EntityDoc): String = {
    val sb = new StringBuilder
    sb.append("INSERT DATA {\n")
    sb.append(s"  wd:${e.id} a schema:Thing ;\n")
    e.labels.foreach { case (lang, v) => sb.append(s"    schema:name \"$v\"@$lang ;\n") }
    e.descriptions.foreach { case (lang, v) => sb.append(s"    schema:description \"$v\"@$lang ;\n") }
    e.aliases.foreach { case (lang, v) => sb.append(s"    skos:altLabel \"$v\"@$lang ;\n") }
    e.claims.foreach { c =>
      val obj = c.dtype match {
        case "wikibase-entityid" => s"wd:${c.value}"
        case "string"            => "\"" + c.value + "\""
        case "time"              => "\"" + c.value + "\"^^xsd:dateTime"
        case "quantity"          => "\"" + c.value + "\"^^xsd:decimal"
        case "monolingualtext"   => "\"" + c.value + "\"@" + c.lang
        case _                   => "\"" + c.value + "\""
      }
      sb.append(s"    wdt:${c.pid} $obj ;\n")
    }
    val body = sb.toString
    // rstrip(" ;\n") + " .\n};\n" (new_entity_rdf.py:111-114)
    body.reverse.dropWhile(ch => ch == ' ' || ch == ';' || ch == '\n').reverse + " .\n};\n"
  }

  /** Spark schema of the (simplified) entity JSON document — the
    * labels/aliases/claims maps of wbgetentities
    * (new_entity_rdf.py:61-108; get_updates.py:695-731).
    */
  val entityJsonSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("labels", MapType(StringType,
      StructType(Seq(StructField("language", StringType), StructField("value", StringType))))),
    StructField("descriptions", MapType(StringType,
      StructType(Seq(StructField("language", StringType), StructField("value", StringType))))),
    StructField("aliases", MapType(StringType,
      ArrayType(StructType(Seq(StructField("value", StringType)))))),
    StructField("claims", MapType(StringType,
      ArrayType(StructType(Seq(
        StructField("mainsnak", StructType(Seq(
          StructField("datavalue", StructType(Seq(
            StructField("type", StringType),
            StructField("value", StructType(Seq(
              StructField("id", StringType),
              StructField("time", StringType),
              StructField("amount", StringType),
              StructField("text", StringType),
              StructField("language", StringType),
              StructField("content", StringType)
            )))
          )))
        ))),
        StructField("references", ArrayType(StructType(Seq(
          StructField("hash", StringType)
        ))))
      )))))
  ))

  /** Distributed form: `jsonCol` holds one entity JSON doc per row → one
    * `INSERT DATA` block per entity. Facet rows are built with explode over
    * the parsed maps, rendered per-type, ordered deterministically
    * (facet rank, then key), and folded with concat_ws.
    */
  def fromJson(spark: SparkSession, df: DataFrame, jsonCol: String): DataFrame = {
    val parsed = df.select(from_json(col(jsonCol), entityJsonSchema).as("e"))
      .select(col("e.id").as("id"), col("e.labels").as("labels"),
        col("e.descriptions").as("descriptions"), col("e.aliases").as("aliases"),
        col("e.claims").as("claims"))

    val labels = parsed
      .select(col("id"), explode(col("labels")).as(Seq("lang", "lv")))
      .select(col("id"), lit(1).as("rank"), col("lang").as("key"),
        concat(lit("    schema:name \""), col("lv.value"), lit("\"@"), col("lang"), lit(" ;")).as("line"))
    val descriptions = parsed
      .select(col("id"), explode(col("descriptions")).as(Seq("lang", "dv")))
      .select(col("id"), lit(2).as("rank"), col("lang").as("key"),
        concat(lit("    schema:description \""), col("dv.value"), lit("\"@"), col("lang"), lit(" ;")).as("line"))
    val aliases = parsed
      .select(col("id"), explode(col("aliases")).as(Seq("lang", "avs")))
      .select(col("id"), col("lang"), posexplode(col("avs")).as(Seq("pos", "av")))
      .select(col("id"), lit(3).as("rank"),
        concat(col("lang"), lpad(col("pos").cast("string"), 4, "0")).as("key"),
        concat(lit("    skos:altLabel \""), col("av.value"), lit("\"@"), col("lang"), lit(" ;")).as("line"))
    val claims = parsed
      .select(col("id"), explode(col("claims")).as(Seq("pid", "cs")))
      .select(col("id"), col("pid"), posexplode(col("cs")).as(Seq("pos", "c")))
      .select(col("id"), col("pid"), col("pos"),
        col("c.mainsnak.datavalue.type").as("dtype"),
        col("c.mainsnak.datavalue.value").as("v"))
      .filter(col("dtype").isNotNull)
      .select(col("id"), lit(4).as("rank"),
        concat(col("pid"), lpad(col("pos").cast("string"), 4, "0")).as("key"),
        concat(lit("    wdt:"), col("pid"), lit(" "),
          when(col("dtype") === "wikibase-entityid", concat(lit("wd:"), col("v.id")))
            .when(col("dtype") === "string", concat(lit("\""), col("v.content"), lit("\"")))
            .when(col("dtype") === "time", concat(lit("\""), col("v.time"), lit("\"^^xsd:dateTime")))
            .when(col("dtype") === "quantity", concat(lit("\""), col("v.amount"), lit("\"^^xsd:decimal")))
            .when(col("dtype") === "monolingualtext",
              concat(lit("\""), col("v.text"), lit("\"@"), col("v.language")))
            .otherwise(concat(lit("\""), coalesce(col("v.content"), lit("")), lit("\""))),
          lit(" ;")).as("line"))

    val allLines = labels.unionByName(descriptions).unionByName(aliases).unionByName(claims)
    allLines
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("rank"), col("key"), col("line")))).as("ls"))
      .select(
        col("id"),
        concat(
          lit("INSERT DATA {\n  wd:"), col("id"), lit(" a schema:Thing ;\n"),
          regexp_replace(
            concat_ws("\n", transform(col("ls"), x => x.getField("line"))),
            " ;$", " ."
          ),
          lit("\n};\n")
        ).as("insert_block")
      )
  }
}
