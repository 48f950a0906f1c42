package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The round driver captures only the last ~2000 chars of the bench run's
  * stdout and parses the JSON line out of that window. Round 4's 67-query
  * line at full double precision overflowed it (`BENCH_r04.json` records
  * `parsed: null` — the round's official numbers were lost). This spec pins
  * the rendered line against the REAL query list so adding queries can
  * never silently push the line past the window again.
  */
class BenchRenderSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted
  private val mapper = new ObjectMapper()

  private def rendered(dec2Stress: Boolean = false): String = {
    // worst-case widths: hundreds of seconds per query, two passes
    val v = if (dec2Stress) 888.888 else 8.888
    Bench.render(
      names,
      names.map(_ -> v).toMap,
      Map.empty,
      passTotals = Seq(888.0, 888.0),
      sfDir = "/root/testdata/sf0.1")
  }

  test("line fits the driver's tail window for the real query list") {
    val line = rendered()
    assert(line.length <= Bench.BudgetChars,
      s"bench line ${line.length} chars exceeds ${Bench.BudgetChars}; " +
        "shorten new query names or drop a field")
    assert(rendered(dec2Stress = true).length <= Bench.BudgetChars,
      "even fully-degraded rendering exceeds the window — act now")
  }

  test("line is one parseable JSON object with the contract fields") {
    val line = rendered()
    assert(!line.contains("\n"))
    val node = mapper.readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(node.get("value").asDouble > 0.0)
    assert(node.get("pass_totals").size() == 2)
    assert(node.get("sf").asText.endsWith("sf0.1"))
    // every query is accounted for: rendered, or disclosed as omitted
    val omitted =
      if (node.has("queries_omitted")) node.get("queries_omitted").asInt else 0
    assert(node.get("queries").size() + omitted == names.size)
    if (node.has("sweep01"))
      // the official-vs-local-session pair is machine-readable (r12 #9)
      assert(node.get("sweep01").asDouble == Bench.LocalSweepSf01Sec)
    else {
      // past ~210 queries the 1990-char window physically cannot hold
      // every entry at 0.1s resolution AND the auxiliary totals; the
      // ladder sheds aux (BASELINE.md carries sweep01 prose) and then
      // the FASTEST entries — but ONLY in exchange for deciseconds
      // resolution on everything still rendered (r13 ADVICE / r14
      // verdict item 5: per-query ratios are the regression signal)
      assert(node.has("qunit") && node.get("qunit").asText == "ds",
        "aux totals may only be shed for a ds-resolution render")
      assert(node.get("queries").size() >= 190,
        s"ds rescue kept only ${node.get("queries").size()} entries")
    }
  }

  test("abbrev tier: overflowing name lists collapse to unique id prefixes; ambiguous ones never do") {
    // 120 long-named queries overflow every full-name rung by construction
    val many = (1 to 120).map(i => s"z${i}_quite_long_query_name")
    val line = Bench.render(many, many.map(_ -> 888.888).toMap, Map.empty,
      passTotals = Seq(888.0), sfDir = "/d")
    assert(line.length <= Bench.BudgetChars)
    val node = mapper.readTree(line)
    assert(node.get("abbrev").asInt == 1)
    assert(node.get("queries").size() == many.size)
    import scala.jdk.CollectionConverters._
    assert(node.get("queries").fieldNames().asScala.toSet ==
      many.map(_.takeWhile(_ != '_')).toSet)
    // full precision is recovered: the first short rung is 3 decimals
    assert(node.get("queries").get("z1").asDouble == 888.888)
    // prefix collision ("x_one"/"x_two") must never abbreviate
    val amb = Bench.render(Seq("x_one", "x_two"),
      Map("x_one" -> 1.0, "x_two" -> 2.0), Map.empty, Seq(3.0), "/d")
    val ambNode = mapper.readTree(amb)
    assert(ambNode.get("abbrev") == null)
    assert(ambNode.get("queries").get("x_one") != null)
  }

  test("error spam cannot overflow the window: ladder truncates then drops errors") {
    // worst realistic case: every query fails in both passes with a
    // 200-char message — decimals alone can't save ~15 kB of error text
    val errs = names.map(_ -> ("x" * 200)).toMap
    val line = Bench.render(names, names.map(_ -> 8.888).toMap, errs,
      passTotals = Seq(888.0, 888.0), sfDir = "/root/testdata/sf0.1")
    assert(line.length <= Bench.BudgetChars)
    val node = mapper.readTree(line)
    // past ~250 queries even the errorless whole-second line cannot
    // hold every entry, so under total error spam the ladder may reach
    // the disclosed slowest-K tier — every query must still be
    // ACCOUNTED for (rendered or counted omitted), never silent
    val omittedQ =
      Option(node.get("queries_omitted")).map(_.asInt).getOrElse(0)
    assert(node.get("queries").size() + omittedQ == names.size)
    // either truncated messages fit, or the map was dropped with a count
    val omitted = Option(node.get("errors_omitted")).map(_.asInt)
    assert(Option(node.get("errors")).exists(_.size() == names.size) ||
      omitted.contains(names.size))
  }

  test("surrogate-bearing error messages render as parseable JSON; trunc never splits a pair") {
    val emoji = "😀" // U+1F600 — one surrogate pair, two UTF-16 units
    val line = Bench.render(Seq("a"), Map("a" -> 1.0),
      Map("a" -> s"boom $emoji$emoji tail"),
      passTotals = Seq(1.0), sfDir = "/d")
    val node = mapper.readTree(line) // surrogates \u-escaped, still valid
    assert(node.get("errors").get("a").asText == s"boom $emoji$emoji tail")
    // a cut landing between the pair's halves drops the orphan high half
    assert(Bench.trunc("ab" + emoji, 3) == "ab")
    assert(Bench.trunc("ab" + emoji, 4) == "ab" + emoji)
    assert(Bench.trunc("ab", 5) == "ab")
  }

  test("sf basename with JSON metacharacters renders as valid JSON") {
    val line = Bench.render(Seq("a"), Map("a" -> 1.0), Map.empty,
      passTotals = Seq(1.0), sfDir = "/tmp/sf\"0.1\\x")
    assert(mapper.readTree(line).get("sf").asText == "sf\"0.1\\x")
  }

  test("value is the best single-pass total; min-query sum stays auditable") {
    val line = Bench.render(
      Seq("a", "b"), Map("a" -> 1.25, "b" -> 2.5),
      Map("b" -> "boom \"quoted\"\npath\\x"),
      passTotals = Seq(5.2, 4.1), sfDir = "/d")
    val node = mapper.readTree(line)
    // headline equals a pass_totals entry (the min), not the minima sum
    assert(math.abs(node.get("value").asDouble - 4.1) < 1e-9)
    assert(math.abs(node.get("pass_totals").get(1).asDouble - 4.1) < 1e-9)
    assert(math.abs(node.get("min_query_total").asDouble - 3.75) < 1e-9)
    assert(node.get("errors").get("b").asText == "boom \"quoted\"\npath\\x")
  }

  test("real query list at realistic widths keeps at least 0.1s per-query resolution") {
    // r13's official report fell to whole seconds at 197 queries — the
    // deciseconds rung must hold 0.1s resolution for round-over-round
    // per-query regression analysis (VERDICT r13 item 8)
    val line = Bench.render(names, names.map(_ -> 1.234).toMap, Map.empty,
      passTotals = Seq(240.0, 238.5), sfDir = "/root/testdata/sf0.1")
    assert(line.length <= Bench.BudgetChars)
    val node = mapper.readTree(line)
    val scale = if (node.has("qunit")) {
      assert(node.get("qunit").asText == "ds"); 0.1
    } else 1.0
    val it = node.get("queries").elements()
    while (it.hasNext) {
      val v = it.next().asDouble * scale
      assert(math.abs(v - 1.234) < 0.06,
        s"per-query resolution degraded below 0.1s: $v")
    }
  }

  test("sweep01 rides only the sf0.1 render (it is an sf0.1 measurement)") {
    def line(sf: String) = Bench.render(Seq("a"), Map("a" -> 1.0), Map.empty,
      passTotals = Seq(1.0), sfDir = s"/root/testdata/$sf")
    assert(mapper.readTree(line("sf0.1")).has("sweep01"))
    assert(!mapper.readTree(line("sf0.001")).has("sweep01"))
    assert(!mapper.readTree(line("sf1")).has("sweep01"))
  }

  test("a pass with failures cannot claim the headline; all-failed falls back to min") {
    // pass 0 is fastest but had a failure (its fast failure path deflates
    // the sum) — the headline must come from the slower COMPLETE pass
    val line = Bench.render(Seq("a"), Map("a" -> 1.0), Map.empty,
      passTotals = Seq(3.0, 5.0), sfDir = "/d", passFails = Seq(1, 0))
    assert(math.abs(mapper.readTree(line).get("value").asDouble - 5.0) < 1e-9)
    // every pass failed somewhere: min over all passes, failures disclosed
    val line2 = Bench.render(Seq("a"), Map("a" -> 1.0), Map("a" -> "x"),
      passTotals = Seq(3.0, 5.0), sfDir = "/d", passFails = Seq(1, 1))
    assert(math.abs(mapper.readTree(line2).get("value").asDouble - 3.0) < 1e-9)
  }

  test("pvar discloses pass-to-pass variance in the artifact; single-pass runs omit it; lean rung sheds it") {
    // two passes, 20% apart: pvar = 6.0/5.0 = 1.2
    val line = Bench.render(Seq("a"), Map("a" -> 1.0), Map.empty,
      passTotals = Seq(6.0, 5.0), sfDir = "/d")
    assert(math.abs(mapper.readTree(line).get("pvar").asDouble - 1.2) < 1e-9)
    // one pass → no ratio to disclose
    val one = Bench.render(Seq("a"), Map("a" -> 1.0), Map.empty,
      passTotals = Seq(5.0), sfDir = "/d")
    assert(mapper.readTree(one).get("pvar") == null)
    // real query list still fits the window with the field present —
    // and pvar survives the LEAN rungs (it is the variance disclosure
    // for exactly the big renders that shed the aux totals)
    val real = Bench.render(names, names.map(_ -> 8.888).toMap, Map.empty,
      passTotals = Seq(888.0, 777.0), sfDir = "/root/testdata/sf0.1")
    assert(real.length <= Bench.BudgetChars)
    val rn = mapper.readTree(real)
    assert(math.abs(rn.get("pvar").asDouble - 888.0 / 777.0) < 0.01)
  }

  test("session_min flag renders when set, survives the lean rung, and fits the window") {
    val line = Bench.render(names, names.map(_ -> 8.8).toMap, Map.empty,
      passTotals = Seq(888.0, 888.0), sfDir = "/root/testdata/sf0.1",
      passFails = Seq(0, 0), sessionMin = true)
    assert(line.length <= Bench.BudgetChars)
    val node = mapper.readTree(line)
    assert(node.get("session_min").asInt() == 1)
    // and absent by default (single-invocation runs stay unflagged)
    assert(mapper.readTree(rendered()).get("session_min") == null)
  }

  test("rendered key set is deterministic: timing noise cannot change which queries appear (round-20)") {
    import scala.jdk.CollectionConverters._
    // two runs of the real query list whose per-query timings differ by
    // boundary-crossing noise (0.14s vs 0.26s rounds 1 ds vs 3 ds —
    // exactly the drift that made r19's slowest-K tier omit a different
    // set each run and the driver flag green queries as dropped)
    def keysAt(v: Double): Set[String] = {
      val line = Bench.render(names, names.map(_ -> v).toMap, Map.empty,
        passTotals = Seq(240.0, 238.5), sfDir = "/root/testdata/sf0.1")
      mapper.readTree(line).get("queries").fieldNames().asScala.toSet
    }
    val k1 = keysAt(0.14)
    val k2 = keysAt(0.26)
    assert(k1 == k2, "omission set moved with timings — must be by-name")
    // the omission is the disclosed fixed set, never silent
    val line = Bench.render(names, names.map(_ -> 0.2).toMap, Map.empty,
      passTotals = Seq(240.0, 238.5), sfDir = "/root/testdata/sf0.1")
    val node = mapper.readTree(line)
    if (node.has("queries_omitted")) {
      assert(node.get("omit_fixed").asInt == 1,
        "an omission tier won without the fixed-by-name set")
      // every omitted name is on the pinned list (so membership is a
      // pure function of the declared query list)
      val rendered = node.get("queries").fieldNames().asScala.toSet
      val omittedNames = names.filterNot(n =>
        rendered.contains(n) || rendered.contains(n.takeWhile(_ != '_')))
      omittedNames.foreach(n =>
        assert(Bench.FixedOmitNames.contains(n), s"'$n' omitted by timing"))
    }
  }

  test("sidecar renderFull: every query at 3dp, full names, no omission tier, parseable (round-19)") {
    val best = names.map(_ -> 8.888).toMap
    val full = Bench.renderFull(names, best,
      Map("q1_pricing_summary" -> "boom " * 100),
      passTotals = Seq(888.0, 900.0), sfDir = "/root/testdata/sf0.1",
      passFails = Seq(0, 1))
    val node = mapper.readTree(full)
    val qs = node.get("queries")
    // EVERY query present under its FULL name at 3-decimal precision
    names.foreach { n =>
      assert(qs.get(n) != null, s"sidecar must carry '$n'")
      assert(math.abs(qs.get(n).asDouble() - 8.888) < 1e-9)
    }
    assert(node.get("queries_omitted") == null,
      "the sidecar never omits queries")
    // headline = min COMPLETE pass (pass 2 had a failure)
    assert(node.get("value").asDouble() == 888.0)
    // errors carried untruncated
    assert(node.get("errors").get("q1_pricing_summary")
      .asText().length > 400)
    assert(node.get("sf").asText() == "sf0.1")
  }
}
