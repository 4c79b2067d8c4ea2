package graft

import graft.SparkSpec

class MainSpec extends SparkSpec {

  test("CLI arg parsing mirrors the reference's flag surface") {
    val a = Main.parse(Array("--type", "edit", "--number", "10",
      "--file", "/tmp/out.ttl", "--data", sfDir, "--latest"))
    assert(a.runArgs.changeType.contains("edit"))
    assert(a.runArgs.number.contains("10"))
    assert(a.runArgs.file.contains("/tmp/out.ttl"))
    assert(a.runArgs.latest && a.data == sfDir)
  }

  test("E1 lifecycle end-to-end: changes file in the reference grammar") {
    val out = Main.run(spark, Main.Args(
      graft.text.Validate.RunArgs(latest = true, number = Some("5")), sfDir))
    // header
    assert(out.startsWith("PREFIX wd: <http://www.wikidata.org/entity/>\n"))
    // per-change info lines + separators
    val infos = "changes for entity: Q\\d+ between old_revid: \\d+ and new_revid: \\d+".r
      .findAllIn(out).size
    assert(infos == 5)
    assert(out.contains("\n" + "=" * 80 + "\n"))
    // every edit diff carries the version-bump DELETE/INSERT pair
    assert(out.contains("INSERT DATA { wd:Q"))
    assert("INSERT DATA \\{ wd:Q\\d+ schema:version \"\\d+\"\\^\\^xsd:integer . \\};".r
      .findAllIn(out).nonEmpty)
  }

  test("E2 lifecycle (--diff-html): diff-table walk output in the reference file grammar") {
    val out = Main.run(spark, Main.Args(
      graft.text.Validate.RunArgs(latest = true, number = Some("4")), sfDir, diffHtml = true))
    assert(out.startsWith("PREFIX wd: <http://www.wikidata.org/entity/>\n"))
    // 4 changes × 5 blocks per generated diff document, blank-line separated
    assert("(?m)^INSERT DATA \\{$".r.findAllIn(out).size == 4 * 3)
    assert("(?m)^DELETE DATA \\{$".r.findAllIn(out).size == 4 * 1)
    assert("(?m)^DELETE DATA\\{$".r.findAllIn(out).size == 4 * 1) // property-family quirk
    // minted statement ids substituted in the whole-claim blocks
    assert("s:Q\\d+-[0-9a-f]{32} a wikibase:Statement \\.".r.findAllIn(out).size == 4)
  }

  test("new-entity path: old_revid==0 changes have INSERT-only diffs") {
    val out = Main.run(spark, Main.Args(
      graft.text.Validate.RunArgs(latest = true, changeType = Some("new"),
        number = Some("3")), sfDir))
    val body = out.split("=" * 80)
    // each new-entity block: no DELETE commands at all
    body.filter(_.contains("changes for entity")).foreach { block =>
      assert(!block.contains("DELETE DATA"), block.take(300))
      assert(block.contains("old_revid: 0"))
    }
  }
}
