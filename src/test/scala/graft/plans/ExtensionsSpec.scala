package graft.plans

import graft.SparkSpec

/** The deployment path for the native expressions: the shared test session
  * is built with ONLY `spark.sql.extensions=graft.plans.GraftExtensions`
  * (SparkSpec) and NO programmatic registration — exactly how a consuming
  * application on a real cluster picks the functions up from the jar. (The
  * extensions class name is a STATIC conf read from the SparkContext at
  * session construction, so it must ride the first builder in the JVM —
  * which is also why the queries that need these functions in arbitrary
  * driver sessions, q11/q48, register per-session programmatically.)
  */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions registers replace_prefixes_fast and scaled_dot_fast for plain SQL") {
    val short = spark
      .sql("SELECT replace_prefixes_fast('http://www.wikidata.org/entity/Q42') AS s")
      .head().getString(0)
    assert(short == "wd:Q42")
    val dot = spark
      .sql("""SELECT scaled_dot_fast(cast(array(1.0, 2.0) as array<float>),
              |                      cast(array(3.0, 0.5) as array<float>)) AS d""".stripMargin)
      .head().getLong(0)
    // floor(1000)*floor(3000) + floor(2000)*floor(500) = 3_000_000 + 1_000_000
    assert(dot == 4000000L)
    // int8_dot_fast over binary literals: 0x01*0x03 + 0x7F*0x01 = 3 + 127
    val i8 = spark.sql("SELECT int8_dot_fast(X'017F', X'0301') AS d").head().getLong(0)
    assert(i8 == 130L)
    // signed bytes: 0xFF = -1
    val neg = spark.sql("SELECT int8_dot_fast(X'FF', X'02') AS d").head().getLong(0)
    assert(neg == -2L)
  }
}
