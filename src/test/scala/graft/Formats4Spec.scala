package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse._

class Formats4Spec extends AnyFunSuite {

  test("phpunit: numbered failure items with message and file:line") {
    val log =
      """PHPUnit 10.5.0 by Sebastian Bergmann.
        |
        |F.
        |
        |1) App\Tests\UserTest::testEmail
        |Failed asserting that false is true.
        |
        |/src/tests/UserTest.php:42
        |
        |FAILURES!
        |Tests: 2, Assertions: 3, Failures: 1.""".stripMargin
    val evs = PhpunitParser.parse(log)
    assert(evs.length === 2) // the failure + the Tests:-tally summary
    assert(evs.head.test_name === Some("App\\Tests\\UserTest::testEmail"))
    assert(evs.head.message === Some("Failed asserting that false is true."))
    assert(evs.head.ref_file === Some("/src/tests/UserTest.php"))
    assert(evs.head.ref_line === Some(42))
    assert(evs(1).category === Some("test-summary"))
    assert(evs(1).severity === graft.model.Severity.Error)
    assert(evs(1).message.exists(_.startsWith("Tests: 2")))
  }

  test("rubocop: severity letters map, cop name as rule") {
    val log =
      """app/user.rb:12:3: C: Style/Documentation: Missing top-level class documentation
        |app/user.rb:20:1: W: Lint/UselessAssignment: Useless assignment to variable
        |app/boom.rb:1:1: E: Lint/Syntax: unexpected token""".stripMargin
    val evs = RubocopParser.parse(log)
    assert(evs.map(_.severity) === Seq("info", "warning", "error"))
    assert(evs.head.rule === Some("Style/Documentation"))
    assert(evs(2).ref_file === Some("app/boom.rb"))
  }

  test("yamllint and terraform diagnostics") {
    val y = "deploy.yaml:12:3: [warning] wrong indentation (indentation)"
    val ye = YamllintParser.parse(y)
    assert(ye.head.severity === "warning")
    assert(ye.head.rule === Some("indentation"))

    val tf =
      """Error: Invalid resource type
        |
        |  on main.tf line 12, in resource "aws_foo" "bar":
        |
        |Warning: Deprecated attribute
        |
        |  on vars.tf line 3:""".stripMargin
    val te = TerraformParser.parse(tf)
    assert(te.length === 2)
    assert(te.head.severity === "error")
    assert(te.head.ref_file === Some("main.tf"))
    assert(te.head.ref_line === Some(12))
    assert(te(1).severity === "warning")
  }

  test("docker build: buildkit and classic failure lines") {
    val log =
      """#7 [3/5] RUN make all
        |#8 ERROR: process "/bin/sh -c make all" did not complete successfully: exit code: 2
        |The command '/bin/sh -c make all' returned a non-zero code: 2""".stripMargin
    val evs = DockerBuildParser.parse(log)
    assert(evs.length === 2)
    assert(evs.forall(_.severity == "error"))
    assert(evs(1).code === Some("2"))
    assert(FormatRegistry.detect(log).map(_.format) === Some("docker_build"))
  }
}
