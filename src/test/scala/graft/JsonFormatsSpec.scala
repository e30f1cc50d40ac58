package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse._

class JsonFormatsSpec extends AnyFunSuite {

  test("cargo json: compiler-message lines with primary span") {
    val log = Seq(
      """{"reason":"compiler-artifact","target":{"name":"app"}}""",
      """{"reason":"compiler-message","message":{"level":"error","code":{"code":"E0308"},"message":"mismatched types","spans":[{"file_name":"src/main.rs","line_start":7,"column_start":9,"is_primary":true}]}}""",
      """{"reason":"compiler-message","message":{"level":"warning","code":null,"message":"unused variable: x","spans":[{"file_name":"src/lib.rs","line_start":3,"column_start":5,"is_primary":true}]}}""",
      """not json at all""",
      """{"reason":"build-finished","success":false}""").mkString("\n")
    val evs = CargoJsonParser.parse(log)
    assert(evs.length === 2)
    assert(evs.head.code === Some("E0308"))
    assert(evs.head.ref_file === Some("src/main.rs"))
    assert(evs.head.ref_line === Some(7))
    assert(evs(1).severity === "warning")
    assert(evs(1).code.isEmpty)
    assert(FormatRegistry.detect(log).map(_.format) === Some("cargo_json"))
  }

  test("eslint json: array-of-files shape with rule ids") {
    val log =
      """[{"filePath":"/src/app.js","messages":[
        |  {"ruleId":"no-unused-vars","severity":2,"message":"'x' is defined but never used.","line":2,"column":7},
        |  {"ruleId":"semi","severity":1,"message":"Missing semicolon.","line":5,"column":20}
        |],"errorCount":1,"warningCount":1},
        |{"filePath":"/src/ok.js","messages":[],"errorCount":0,"warningCount":0}]""".stripMargin
    val evs = EslintJsonParser.parse(log)
    assert(evs.length === 2)
    assert(evs.head.severity === "error")
    assert(evs.head.rule === Some("no-unused-vars"))
    assert(evs.head.ref_file === Some("/src/app.js"))
    assert(evs(1).severity === "warning")
    assert(FormatRegistry.detect(log).map(_.format) === Some("eslint_json"))
  }

  test("malformed json never crashes, yields zero events") {
    assert(CargoJsonParser.parse("{\"reason\":") === Seq.empty)
    assert(EslintJsonParser.parse("[{bad") === Seq.empty)
    assert(EslintJsonParser.parse("") === Seq.empty)
  }
}
