package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.mapping.RawDict

/** Property-based specs (SURVEY.md §5 plan item c): invariants of the
  * driver-side algorithms over generated inputs (raw ScalaCheck — sbt runs
  * Properties through its built-in ScalaCheck framework). */
object PropertySpec extends Properties("graft") {

  private val word: Gen[String] = Gen.asciiPrintableStr.map(_.take(12))

  property("ro-ratio bounds and identity") = forAll(word, word) { (a, b) =>
    val r = RawDict.ratio(a, b)
    r >= 0.0 && r <= 1.0 && RawDict.ratio(a, a) == 1.0
  }

  property("ro-ratio containment lower bound") =
    forAll(word.suchThat(_.nonEmpty), word) { (a, pad) =>
      RawDict.ratio(a, a + pad) >= 2.0 * a.length / (2 * a.length + pad.length) - 1e-12
    }

  property("fuzzyMatch never maps below threshold") = {
    val names = Gen.listOfN(5, word.suchThat(_.nonEmpty))
    forAll(names, names) { (raws, props) =>
      RawDict.fuzzyMatch(raws, props, ratioLimit = 0.75).forall { case (raw, prop) =>
        val n = raw.toLowerCase.replace(" ", "_")
        RawDict.ratio(n, prop.toLowerCase.replace(" ", "_")) >= 0.75
      }
    }
  }

  property("losslessInt mirror is idempotent and value-preserving") = {
    def lossless(s: String): String = {
      val d = try Some(s.toDouble) catch { case _: Throwable => None }
      d match {
        case Some(x) if !x.isNaN && !x.isInfinite && x == math.floor(x) && math.abs(x) < 9007199254740992.0 =>
          x.toLong.toString
        case _ => s
      }
    }
    val gen = Gen.oneOf(
      Gen.choose(-1e6, 1e6).map(_.toString),
      Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(_.toString),
      word)
    forAll(gen) { s =>
      val once = lossless(s)
      val idempotent = lossless(once) == once
      val preserving = (try Some(s.toDouble) catch { case _: Throwable => None }) match {
        case Some(orig) if !orig.isNaN && orig == math.floor(orig) && math.abs(orig) < 9007199254740992.0 =>
          (try once.toDouble catch { case _: Throwable => Double.NaN }) == orig
        case _ => true
      }
      Prop(idempotent && preserving)
    }
  }

  // TopKBuffer vs reference sort under the full SQL ordering domain:
  // score DESC (Double.compare: NaN above +Inf, -0.0 < 0.0), id ASC
  // tie-break, NULL scores last — any insertion order, any partial split.
  property("topk buffer == reference sort under merge, nulls, edge doubles") = {
    val score: Gen[Option[Double]] = Gen.frequency(
      4 -> Gen.choose(-10.0, 10.0).map(Some(_)),
      3 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        0.0, -0.0, 1.0, 1.0).map(Some(_)), // duplicated 1.0 encourages ties
      1 -> Gen.const(None))                // SQL NULL score
    val rows: Gen[List[(Option[Double], Long)]] =
      Gen.listOf(Gen.zip(score, Gen.choose(0L, 30L)))
    forAll(rows, Gen.choose(1, 6), Gen.choose(1, 4)) { (xs, k, splits) =>
      import graft.functions.TopKAggregate.TopKBuffer
      val expected = xs.sortWith { case ((s1, i1), (s2, i2)) =>
        (s1, s2) match {
          case (None, None) => i1 < i2
          case (None, _) => false // nulls last
          case (_, None) => true
          case (Some(a), Some(b)) =>
            val c = java.lang.Double.compare(a, b)
            c > 0 || (c == 0 && i1 < i2)
        }
      }.take(k).map(_._2)
      def feed(b: TopKBuffer, g: Seq[(Option[Double], Long)]): TopKBuffer = {
        g.foreach {
          case (Some(s), id) => b.insert(s, id)
          case (None, id) => b.insertNullScore(id)
        }
        b
      }
      // split into partial buffers, then merge (simulates map-side partials)
      val parts = xs.grouped(math.max(1, (xs.size + splits - 1) / splits))
        .map(g => feed(new TopKBuffer(k), g)).toList
      val merged = parts.headOption.getOrElse(new TopKBuffer(k))
      parts.drop(1).foreach { o =>
        var i = 0
        while (i < o.size) {
          if (o.nulls(i)) merged.insertNullScore(o.ids(i))
          else merged.insert(o.scores(i), o.ids(i))
          i += 1
        }
      }
      val got = (0 until merged.size).map(merged.ids(_)).toList
      Prop(got == expected) :| s"got=$got expected=$expected xs=$xs k=$k"
    }
  }

  property("xlsx colRef is the bijective A1 base-26 encoding") = {
    // injective over a wide range, and decodes back to the index
    def decode(s: String): Int =
      s.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
    forAll(Gen.choose(0, 100000)) { i =>
      val r = graft.sources.XlsxWriter.colRef(i)
      Prop(r.nonEmpty && r.forall(c => c >= 'A' && c <= 'Z') && decode(r) == i)
    }
  }
}
