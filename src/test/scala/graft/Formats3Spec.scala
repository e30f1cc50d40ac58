package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse._

/** Pure-JVM parser specs for the third wave of formats. */
class Formats3Spec extends AnyFunSuite {

  test("shellcheck: location header + SC code lines") {
    val log =
      """In deploy.sh line 12:
        |cp $SRC $DST
        |   ^--^ SC2086 (info): Double quote to prevent globbing.
        |
        |In deploy.sh line 20:
        |[ $x == y ]
        |  ^-- SC2070 (error): Always true because of missing quotes.""".stripMargin
    val evs = ShellcheckParser.parse(log)
    assert(evs.length === 2)
    assert(evs.head.code === Some("SC2086"))
    assert(evs.head.severity === "info")
    assert(evs.head.ref_line === Some(12))
    assert(evs(1).severity === "error")
    assert(evs(1).ref_line === Some(20))
  }

  test("gradle: kotlinc diagnostics and task failures") {
    val log =
      """> Task :app:compileKotlin FAILED
        |e: /src/App.kt: (12, 5): Unresolved reference: foo
        |w: /src/Util.kt: (3, 1): Variable 'x' is never used
        |FAILURE: Build failed with an exception.""".stripMargin
    val evs = GradleParser.parse(log)
    assert(evs.map(_.severity) === Seq("error", "error", "warning", "error"))
    assert(evs(1).ref_file === Some("/src/App.kt"))
    assert(evs(1).ref_line === Some(12))
    assert(FormatRegistry.detect(log).map(_.format) === Some("gradle_build"))
  }

  test("junit xml: pass/fail testcases with classnames") {
    val xml =
      """<?xml version="1.0"?>
        |<testsuite name="com.example.AppTest" tests="3">
        |  <testcase classname="com.example.AppTest" name="testAdd" time="0.01"/>
        |  <testcase classname="com.example.AppTest" name="testDiv" time="0.02">
        |    <failure message="expected 2 but was 3">stack</failure>
        |  </testcase>
        |  <testcase classname="com.example.AppTest" name="testMul" time="0.01"/>
        |</testsuite>""".stripMargin
    val evs = JunitXmlParser.parse(xml)
    assert(evs.map(_.severity) === Seq("test_pass", "test_fail", "test_pass"))
    assert(evs(1).test_name === Some("testDiv"))
    assert(evs(1).message === Some("expected 2 but was 3"))
    assert(evs(1).ref_file === Some("com.example.AppTest"))
  }

  test("rspec: rerun lines become failures with locations") {
    val log =
      """Failures:
        |
        |rspec ./spec/user_spec.rb:42 # User validates email
        |rspec ./spec/order_spec.rb:7 # Order totals items
        |
        |5 examples, 2 failures""".stripMargin
    val evs = RspecParser.parse(log)
    assert(evs.length === 2)
    assert(evs.head.ref_file === Some("./spec/user_spec.rb"))
    assert(evs.head.ref_line === Some(42))
    assert(evs.head.test_name === Some("User validates email"))
  }

  test("golangci-lint and msbuild diagnostics") {
    val go = "main.go:10:2: ineffectual assignment to x (ineffassign)"
    val g = GolangciParser.parse(go)
    assert(g.head.rule === Some("ineffassign"))
    assert(g.head.ref_column === Some(2))

    val ms = """Program.cs(12,34): error CS1002: ; expected [/path/proj.csproj]"""
    val m = MsbuildParser.parse(ms)
    assert(m.head.code === Some("CS1002"))
    assert(m.head.severity === "error")
    assert(m.head.ref_file === Some("Program.cs"))
  }
}
