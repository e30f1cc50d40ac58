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

  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(0, 120).flatMap(nEdges =>
      Gen.listOfN(nEdges, for {
        a <- Gen.chooseNum(0L, 60L)
        b <- Gen.chooseNum(0L, 60L)
      } yield (a, b)))

  /** Brute-force reference labeling: BFS from every node, label = min
    * id reachable. O(V·E) — fine at generator scale. */
  private def bfsLabels(edges: List[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map { n =>
      var seen = Set(n); var frontier = Set(n)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj) -- seen
        seen ++= frontier
      }
      n -> seen.min
    }.toMap
  }

  test("dedup clusters: union-find labels equal brute-force BFS min labels") {
    // self-loops, parallel edges, isolated-free random multigraphs —
    // the fast path must agree with the definitional labeling exactly
    check("union-find", Prop.forAll(graphGen) { edges =>
      graft.ml.DedupClusters.unionFindLabels(edges.iterator) == bfsLabels(edges)
    })
  }

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

  test("every registered parser is total and well-formed on arbitrary text") {
    // stronger than the auto-detect property above: run EVERY parser
    // directly (no detection gate) over adversarial-ish line soup —
    // colons, numbers, brackets, the shapes diag regexes anchor on.
    val lineGen = Gen.oneOf(
      Gen.asciiPrintableStr,
      for {
        f <- Gen.oneOf("a.c", "b/c.py", "x.rs", "y.java", "z.go", "w.rb", "m.md")
        l <- Gen.chooseNum(0, 99999); c <- Gen.chooseNum(0, 999)
        w <- Gen.oneOf("error", "warning", "ok", "not ok", "FAILED", "[ERROR]")
        m <- Gen.asciiPrintableStr
      } yield s"$f:$l:$c: $w: $m")
    val textGen = Gen.listOfN(12, lineGen).map(_.mkString("\n"))
    val parsers = graft.parse.FormatRegistry.parsers
    check("all-parsers", Prop.forAll(textGen) { content =>
      parsers.forall { p =>
        val evs = p.parse(content)
        evs.zipWithIndex.forall { case (e, i) =>
          e.event_index == i.toLong &&
            e.severity.nonEmpty &&
            e.log_line_start.forall(_ >= 1) &&
            e.log_line_end.forall(end => e.log_line_start.forall(_ <= end))
        }
      }
    })
  }

  test("vec_dot / vec_l2sq kernels: match plain folds, metric-ish properties") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import graft.plans.VectorOps
    def arr(xs: Seq[Double]): ArrayData =
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs.toArray)
    val vecGen = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6)))
    check("dot-matches-fold", Prop.forAll(vecGen, vecGen) { (a, b) =>
      if (a.length != b.length) VectorOps.dot(arr(a), arr(b)) == null
      else {
        val expect = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
        VectorOps.dot(arr(a), arr(b)).doubleValue() == expect
      }
    })
    check("l2sq-nonneg-and-sym", Prop.forAll(vecGen, vecGen) { (a, b) =>
      if (a.length != b.length) true
      else {
        val d = VectorOps.l2sq(arr(a), arr(b)).doubleValue()
        d >= 0.0 && d == VectorOps.l2sq(arr(b), arr(a)).doubleValue()
      }
    })
    check("dot-symmetric", Prop.forAll(vecGen) { a =>
      VectorOps.dot(arr(a), arr(a)).doubleValue() >= 0.0
    })
  }

  test("minhash slot arithmetic: in range, overflow-free for 32-bit halves") {
    import graft.ml.TextDedup.{permA, permB, minhashP}
    val half = Gen.chooseNum(0L, (1L << 32) - 1)
    val slot = Gen.chooseNum(0, 63)
    check("range", Prop.forAll(half, half, slot) { (h1, h2, j) =>
      val v = (h1 * permA(j) + h2 * permB(j) + j) % minhashP
      // no Long overflow upstream (both products stay under 2^50, sum
      // under 2^51) and the slot value lands in [0, p)
      h1 * permA(j) >= 0 && h2 * permB(j) >= 0 && v >= 0 && v < minhashP
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

  test("filter mini-language: total on arbitrary input — ParseError or a Column, never a raw parser error") {
    import graft.api.FilterLang
    val anyStr = Gen.oneOf(
      Gen.asciiPrintableStr,                       // adversarial: backticks, dots, operators
      Gen.alphaNumStr.map(k => s"$k=value"),       // well-formed equality
      Gen.alphaNumStr.map(k => s"$k~pat"),         // contains
      Gen.alphaNumStr.map(k => s"$k=a,b,c"))       // IN-list
    check("total", Prop.forAll(anyStr) { s =>
      try { FilterLang.parse(s); true }
      catch {
        case _: FilterLang.ParseError => true
        case _: Throwable => false
      }
    })
    // dispatch picks the documented operator per form
    assert(FilterLang.parse("sev=error").toString.contains("="))
    assert(FilterLang.parse("msg~time out").toString.toUpperCase.contains("ILIKE"))
    assert(FilterLang.parse("sev=a,b").toString.toUpperCase.contains("IN"))
    assert(FilterLang.parse("sev!=x").toString.startsWith("!(")) // =!= renders !(=(

    // malformed key (unbalanced backtick) is the documented error, not
    // Spark's attribute-name parser exception
    intercept[FilterLang.ParseError](FilterLang.parse("a`b=c"))
    intercept[FilterLang.ParseError](FilterLang.parse("no operator here"))
  }
}
