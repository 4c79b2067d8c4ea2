package graft.text

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime

/** Ports the reference's verify_date (6 cases) and verify_args (12 cases)
  * tests (/root/reference/test/wikidata_update/test_sparql_updates.py:
  * 106-234), with `now` injected for determinism.
  */
class ValidateSpec extends AnyFunSuite {

  val now: LocalDateTime = LocalDateTime.of(2024, 6, 15, 12, 0, 0)

  test("verify_date: valid recent date") {
    assert(Validate.verifyDate("2024-06-10 08:30:00", now))
  }
  test("verify_date: malformed shapes rejected") {
    assert(!Validate.verifyDate("2024-06-10T08:30:00", now)) // T separator
    assert(!Validate.verifyDate("2024/06/10 08:30:00", now))
    assert(!Validate.verifyDate("24-06-10 08:30:00", now))
    assert(!Validate.verifyDate("2024-06-10 8:30:00", now))
    assert(!Validate.verifyDate("garbage", now))
    assert(!Validate.verifyDate("", now))
  }
  test("verify_date: reference range quirks preserved (month 12 / day 31 invalid)") {
    assert(!Validate.verifyDate("2024-12-01 00:00:00", now))
    assert(!Validate.verifyDate("2024-05-31 00:00:00", now))
    assert(Validate.verifyDate("2024-05-30 00:00:00", now))
  }
  test("verify_date: recency window — older than 1 month and future rejected") {
    assert(!Validate.verifyDate("2024-05-01 00:00:00", now)) // > 1 month ago
    assert(!Validate.verifyDate("2024-06-16 00:00:00", now)) // future
    assert(Validate.verifyDate("2024-05-16 00:00:00", now)) // just inside
  }

  import Validate.RunArgs
  test("verify_args: latest xor explicit range") {
    assert(Validate.verifyArgs(RunArgs(latest = true, start = Some("2024-06-10 00:00:00")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(start = Some("2024-06-10 00:00:00")), now).isDefined) // start without end
    assert(Validate.verifyArgs(RunArgs(end = Some("2024-06-10 00:00:00")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(latest = true), now).isEmpty)
  }
  test("verify_args: type / file / number / id domains") {
    assert(Validate.verifyArgs(RunArgs(changeType = Some("edit")), now).isEmpty)
    assert(Validate.verifyArgs(RunArgs(changeType = Some("log")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(file = Some("out.ttl")), now).isEmpty)
    assert(Validate.verifyArgs(RunArgs(file = Some("out.csv")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(number = Some("500")), now).isEmpty)
    assert(Validate.verifyArgs(RunArgs(number = Some("501")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(number = Some("0")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(number = Some("x")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(id = Some("Q42")), now).isEmpty)
    assert(Validate.verifyArgs(RunArgs(id = Some("P42")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(id = Some("Qx")), now).isDefined)
  }
  test("verify_args: ordered range required") {
    assert(Validate.verifyArgs(RunArgs(
      start = Some("2024-06-12 00:00:00"), end = Some("2024-06-10 00:00:00")), now).isDefined)
    assert(Validate.verifyArgs(RunArgs(
      start = Some("2024-06-10 00:00:00"), end = Some("2024-06-12 00:00:00")), now).isEmpty)
  }
}
