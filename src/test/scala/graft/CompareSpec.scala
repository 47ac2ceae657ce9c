package graft

import graft.eval.{Compare, J, Normalize}
import graft.eval.J._
import org.scalatest.funsuite.AnyFunSuite

/** compare_json / normalize replicas vs vectors produced by executing the
  * reference (src/test/resources/gen_vectors.py). */
class CompareSpec extends AnyFunSuite {

  private lazy val vectors: JObj = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/refvectors.json"), "UTF-8")
    try J.parse(src.mkString).asInstanceOf[JObj] finally src.close()
  }

  // reconstruct the exact gt/pred pairs used by the generator
  private val gt1 = J.parse("""{
    "format": "Detailed", "bill_no": "B-001", "provider_name": "",
    "room_charges": {"ACCOMMODATION": [
      {"service_code": "A1", "description": "Ward 2", "date": "2024-01-01", "quantity": "2",
       "gross_amount": "1,200.00", "discount": "(100)", "allocated_amount": "1100.00"},
      {"service_code": "A2", "description": "Ward 3", "date": "2024-01-02", "quantity": "1",
       "gross_amount": "300", "discount": "0", "allocated_amount": "300"}]},
    "tags": ["a", "b", "b", "c"],
    "totals": {"grand": "1,400.00", "sub": "1400"}}""")
  private val pred1 = J.parse("""{
    "format": "detailed ", "bill_no": "B-002", "provider_name": "Some Hospital",
    "room_charges": {"ACCOMMODATION": [
      {"service_code": "A2", "description": "ward 3", "date": "2024-01-02", "quantity": "1.0",
       "gross_amount": "300.005", "discount": "0.0", "allocated_amount": "300"},
      {"service_code": "A1", "description": "Ward 2", "date": "2024-01-01", "quantity": "2",
       "gross_amount": "1200", "discount": "(100.00)", "allocated_amount": "1,100"}]},
    "tags": ["b", "a", "x"],
    "totals": {"grand": "1400.001"}}""")

  private def expectDiff(group: String): (Int, Int, Vector[String], Vector[String]) = {
    val Vector(JLong(c), JLong(t), JArr(mm), JArr(ms)) =
      vectors.get(group).get.asInstanceOf[JArr].items
    (c.toInt, t.toInt, mm.map(pyStr), ms.map(pyStr))
  }

  private def check(group: String, gt: J, pred: J): Unit = {
    val (c, t, mm, ms) = expectDiff(group)
    val d = Compare.compareJson(gt, pred)
    assert((d.correct, d.total, d.mismatches, d.missing) == ((c, t, mm, ms)), group)
  }

  test("compare1: nested record with greedy alignment + multiset tags") {
    check("compare1", gt1, pred1)
  }
  test("compare2: missing subtree uses count_leafs approximations") {
    check("compare2",
      J.parse("""{"a": {"b": [{"k1": "1", "k2": "2"}, {"k1": "3", "k2": "4"}], "c": [], "d": ["x","y"]}, "e": "5"}"""),
      J.parse("""{"e": "5.0"}"""))
  }
  test("compare3: fewer prediction items than GT items") {
    check("compare3",
      J.parse("""{"list": [{"f": "1"}, {"f": "2"}, {"f": "3"}]}"""),
      J.parse("""{"list": [{"f": "2"}]}"""))
  }
  test("compare4: type mismatches (list vs scalar, dict vs scalar)") {
    check("compare4",
      J.parse("""{"x": ["1", "2"], "y": {"z": "1"}}"""),
      J.parse("""{"x": "notalist", "y": "notadict"}"""))
  }
  test("compare5: greedy alignment resolves both items on crossed ties") {
    check("compare5",
      J.parse("""{"l": [{"a": "1", "b": "2"}, {"a": "1", "b": "9"}]}"""),
      J.parse("""{"l": [{"a": "1", "b": "9"}, {"a": "1", "b": "2"}]}"""))
  }

  private val gtFull = J.parse(new String(
    getClass.getResourceAsStream("/gt_full.json").readAllBytes(), "UTF-8"))

  test("normalize_ground_truth_to_response matches reference exactly") {
    val got    = Normalize.groundTruthToResponse(gtFull)
    val expect = vectors.get("gt_normalized").get
    assert(J.canonical(got) == J.canonical(expect))
  }

  test("convert_ground_truth matches reference exactly") {
    val got    = Normalize.convertGroundTruth(gtFull)
    val expect = vectors.get("gt_converted").get
    assert(J.canonical(got) == J.canonical(expect))
  }

  test("full metrics path matches reference (accuracy / schema / values)") {
    val m      = vectors.get("metrics_full").get.asInstanceOf[JObj]
    val gtNorm = Normalize.groundTruthToResponse(gtFull)
    // rebuild the perturbed prediction the generator used
    val pred0 = Normalize.groundTruthToResponse(gtFull)
    val pred = JObj(pred0.fields.flatMap {
      case ("bill_no", _)         => Some("bill_no" -> (JStr("INV-8"): J))
      case ("gl_reference_no", _) => None
      case ("room_charges", rc: JObj) =>
        val acc = rc.get("ACCOMMODATION").get.asInstanceOf[JArr]
        val li0 = acc.items.head.asInstanceOf[JObj]
        val li = JObj(li0.fields.map {
          case ("gross_amount", _) => "gross_amount" -> (JStr("2000.005"): J)
          case kv                  => kv
        })
        Some("room_charges" -> (obj("ACCOMMODATION" -> JArr(li +: acc.items.tail)): J))
      case kv => Some(kv)
    })
    val d = Compare.compareJson(gtNorm, pred)
    assert(d.correct == m.get("correct").collect { case JLong(l) => l.toInt }.get)
    assert(d.total == m.get("total").collect { case JLong(l) => l.toInt }.get)
    assert(d.mismatches == m.get("mismatches").get.asInstanceOf[JArr].items.map(pyStr))
    assert(d.missing == m.get("missing").get.asInstanceOf[JArr].items.map(pyStr))
    val mx = Compare.metrics(d)
    def dbl(k: String) = m.get(k).collect { case JDouble(x) => x; case JLong(l) => l.toDouble }.get
    assert(mx.accuracy == dbl("accuracy"))
    assert(mx.schemaAccuracy == dbl("schema_accuracy"))
    assert(mx.valuesAccuracy == dbl("values_accuracy"))
  }
}
