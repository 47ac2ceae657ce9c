package graft

import graft.extract.PdfLayout
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class PdfLayoutSpec extends AnyFunSuite {

  test("parseRun parses coordinates; malformed runs dropped") {
    assert(PdfLayout.parseRun("10 20 hello world").contains(PdfLayout.GlyphRun(10, 20, "hello world")))
    assert(PdfLayout.parseRun("x y z").isEmpty)
    assert(PdfLayout.parseRun("10").isEmpty)
  }

  test("runs on one line are merged left-to-right") {
    val out = PdfLayout.extract(Seq("90 10 world", "10 10 hello"))
    assert(out == Seq("hello world"))
  }

  test("lines split into blocks at vertical gaps > BlockGapY") {
    val out = PdfLayout.extract(Seq(
      "10 10 a", "10 20 b",   // block 1 (gap 10 <= 30)
      "10 100 c", "10 110 d")) // block 2 (gap 80 > 30)
    assert(out == Seq("a b", "c d"))
  }

  test("two-column reading order: left column fully before right") {
    val out = PdfLayout.extract(Seq(
      "600 10 right-top", "10 10 left-top", "600 200 right-bot", "10 200 left-bot"))
    assert(out == Seq("left-top", "left-bot", "right-top", "right-bot"))
  }

  test("result is independent of input order (determinism under shuffle)") {
    val rng  = new Random(7)
    val runs = (0 until 4).flatMap { b =>
      (0 until 3).flatMap { l =>
        (0 until 5).map(w => s"${(b % 2) * 500 + 10 + w * 40} ${(b / 2) * 200 + 10 + l * 10} w${b}_${l}_$w")
      }
    }
    val expected = PdfLayout.extract(runs)
    (1 to 5).foreach { _ =>
      assert(PdfLayout.extract(rng.shuffle(runs)) == expected)
    }
    assert(expected.size == 4)
  }
}
