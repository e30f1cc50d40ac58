package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.analytics.Lines
import graft.api.RefResolver
import graft.plans.BitHamming
import org.apache.spark.unsafe.types.UTF8String

/** Property-based tests for the pure kernels (beyond the reference's
  * test strategy, which has no property testing — SURVEY.md §5).
  * Spark-free: these run on the raw Scala/JVM functions, driven by
  * scalacheck's own runner (no scalatest bridge on the classpath).
  */
class PropertySpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val bitString: Gen[String] =
    Gen.chooseNum(0, 64).flatMap(n => Gen.stringOfN(n, Gen.oneOf('0', '1')))

  private def dist(x: String, y: String): Int =
    BitHamming.distance(UTF8String.fromString(x), UTF8String.fromString(y))

  test("bit_hamming: metric axioms (identity, symmetry, triangle, bounds)") {
    check("identity", Prop.forAll(bitString)(a => dist(a, a) == 0))
    check("symmetry", Prop.forAll(bitString, bitString)((a, b) =>
      dist(a, b) == dist(b, a)))
    check("triangle", Prop.forAll(bitString, bitString, bitString)((a, b, c) =>
      dist(a, c) <= dist(a, b) + dist(b, c)))
    check("bounds", Prop.forAll(bitString, bitString)((a, b) =>
      dist(a, b) >= math.abs(a.length - b.length) &&
        dist(a, b) <= math.max(a.length, b.length)))
  }

  test("ref grammar: serial/tag/relative forms round-trip") {
    val tagGen = Gen.identifier
      .suchThat(t => t.nonEmpty && t.toLongOption.isEmpty && !t.startsWith("~"))
    check("serial", Prop.forAll(Gen.chooseNum(1L, 999999L))(s =>
      RefResolver.parse(s.toString).runSerial.contains(s)))
    check("tag:serial", Prop.forAll(tagGen, Gen.chooseNum(1L, 9999L))((t, s) => {
      val p = RefResolver.parse(s"$t:$s")
      p.tag.contains(t) && p.runSerial.contains(s)
    }))
    check("relative", Prop.forAll(Gen.chooseNum(1, 500))(n =>
      RefResolver.parse(s"~$n").relative.contains(n)))
    check("tag:~rel:event",
      Prop.forAll(tagGen, Gen.chooseNum(1, 99), Gen.chooseNum(0L, 99L))((t, r, e) => {
        val p = RefResolver.parse(s"$t:~$r:$e")
        p.tag.contains(t) && p.relative.contains(r) && p.eventId.contains(e)
      }))
  }

  test("line-spec parser: windows always well-formed (lo >= 1, lo <= hi)") {
    check("specs", Prop.forAll(Gen.chooseNum(1, 100000), Gen.chooseNum(0, 1000))((n, d) =>
      Seq(s"$n", s"$n +/-$d", s"$n-${n + d}", s"$n-", s"-$n").forall { spec =>
        val (lo, hi) = Lines.parseSpec(spec)
        lo >= 1 && lo <= hi
      }))
  }

  test("blob store: load inverts store, addressing deterministic") {
    val bs = new graft.store.BlobStore(
      java.nio.file.Files.createTempDirectory("prop_blobs").toString,
      inlineThreshold = 64, maxBytes = 1 << 20)
    val bytesGen = Gen.listOf(Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray)
    check("roundtrip", Prop.forAll(bytesGen) { bytes =>
      val (t1, r1, h1) = bs.store(bytes)
      val (_, r2, h2) = bs.store(bytes)
      h1 == h2 && r1 == r2 && bs.load(t1, r1).toSeq == bytes.toSeq
    })
  }

  test("format auto-detect and parse: total on arbitrary text") {
    val textGen = Gen.listOf(Gen.asciiPrintableStr).map(_.mkString("\n"))
    check("total", Prop.forAll(textGen) { content =>
      val parsed = graft.parse.FormatRegistry.parse(content, "auto")
      parsed.forall(e => e.severity.nonEmpty && e.event_index >= 0)
    })
  }

  test("fingerprint template: number-insensitive normalization") {
    val msgGen = for {
      base <- Gen.oneOf("undefined variable", "missing include", "bad cast at line")
      n1 <- Gen.chooseNum(0, 99999)
      n2 <- Gen.chooseNum(0, 99999)
    } yield (s"$base $n1", s"$base $n2")
    def norm(s: String) =
      s.replaceAll("0x[0-9a-fA-F]+", "<hex>").replaceAll("[0-9]+", "<n>")
    check("templates", Prop.forAll(msgGen) { case (m1, m2) => norm(m1) == norm(m2) })
  }
}
