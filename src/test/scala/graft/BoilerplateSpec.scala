package graft

import graft.extract.Boilerplate
import graft.extract.Boilerplate.Block
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {

  test("parse strips tags and counts words / link words") {
    val b = Boilerplate.parse("""<div>hello <a href="#">link one</a> world</div>""")
    assert(b.words == 4)
    assert(b.linkWords == 2)
    assert(b.text == "hello link one world")
  }

  test("parse of pure-anchor nav block has link density 1") {
    val b = Boilerplate.parse("""<a href="/">home</a> <a href="/a">about us</a>""")
    assert(b.words == 3 && b.linkWords == 3)
    assert(b.linkDensity == 1.0)
  }

  test("high link density is always boilerplate") {
    val nav = Boilerplate.parse("""<a>home</a> <a>about</a>""")
    val big = Block("x " * 50, 100, 0)
    assert(!Boilerplate.isContent(big, nav, big))
  }

  test("long low-link block is always content") {
    val long = Block("w", 41, 0)
    val navP = Block("n", 3, 3) // prev linkDensity 1.0 > 0.555 branch
    assert(Boilerplate.isContent(navP, long, navP))
    val textP = Block("t", 5, 0) // prev linkDensity 0 branch
    assert(Boilerplate.isContent(textP, long, textP))
  }

  test("short block near content: prev words > 4 pulls it in (WSDM rules)") {
    val prev = Block("p", 10, 0)
    val curr = Block("c", 6, 0)
    val next = Block("n", 2, 0)
    assert(Boilerplate.isContent(prev, curr, next))
    assert(!Boilerplate.isContent(Block("p", 2, 0), curr, next))
  }

  test("extract keeps content order and collapses whitespace") {
    val blocks = Seq(
      """<a>home</a> <a>login</a>""",
      "<p>\n  " + Seq.fill(45)("word").mkString(" ") + "\n</p>",
      """<div><a>next</a> <a>prev</a></div>""",
      "<p>" + Seq.fill(50)("tail").mkString(" ") + "</p>")
    val out = Boilerplate.extract(blocks)
    assert(out.size == 2)
    assert(out.head == Seq.fill(45)("word").mkString(" "))
    assert(out(1) == Seq.fill(50)("tail").mkString(" "))
  }

  test("empty input / whitespace-only blocks yield nothing") {
    assert(Boilerplate.extract(Nil).isEmpty)
    assert(Boilerplate.extract(Seq("<div>   </div>")).isEmpty)
  }
}
