package graft.corpus

import graft.eval.J
import graft.eval.J._
import scala.util.Random

/** Seeded generator of (golden ground-truth JSON, prediction JSON) pairs
  * in the reference's record shapes (FIXTURES.md §3/§4): nested 5-section
  * ground truth + a prediction derived from it with controlled,
  * deterministic defects. Exercises the tolerance rules the eval must
  * honor: thousands commas, accounting negatives, case/whitespace noise,
  * reordered line-item lists, values inside/outside the ±0.01 tolerance,
  * dropped fields (FIXTURES.md §4 checklist).
  *
  * Pure per-doc function of (idx, seed) — distributable like Corpus.
  */
object EvalCorpus {

  private val Providers = Vector("General Hospital", "City Medical Center", "St. Mary Clinic")
  private val Services  = Vector("Ward Fee", "CBC Panel", "X-Ray Chest", "Infusion Set",
    "Oxygen", "Theatre Use", "Dressing", "Consult Visit")

  private def mix(seed: Long, idx: Long): Long = {
    var z = seed + 0x6C62272E07BB0142L + idx * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z ^ (z >>> 27)
  }

  private def money(rng: Random): String = {
    val v = (rng.nextInt(500000) + 100) / 100.0
    val s = f"$v%,.2f"
    if (rng.nextDouble() < 0.15) s"($s)" else s
  }

  private def lineItem(rng: Random, i: Int): JObj = obj(
    "service_code"     -> JStr(f"S$i%03d"),
    "description"      -> JStr(Services(rng.nextInt(Services.length))),
    "date"             -> JStr(f"2024-0${1 + rng.nextInt(9)}%s-1${rng.nextInt(9)}%s"),
    "quantity"         -> JLong(1 + rng.nextInt(5)),
    "gross_amount"     -> JStr(money(rng)),
    "discount"         -> JStr(if (rng.nextBoolean()) "0" else money(rng)),
    "allocated_amount" -> JStr(money(rng)))

  private def items(rng: Random, n: Int): JArr =
    JArr((0 until n).map(i => lineItem(rng, i): J).toVector)

  /** One nested ground-truth record (reference GT schema, app.py:69-141). */
  def groundTruth(idx: Long, seed: Long): JObj = {
    val rng = new Random(mix(seed, idx))
    obj(
      "document_details" -> obj(
        "format"        -> JStr(if (rng.nextBoolean()) "Itemized" else "Summary"),
        "bill_no"       -> JStr(f"INV-$idx%06d"),
        "provider_name" -> JStr(Providers(rng.nextInt(Providers.length)))),
      "patient_information" -> obj(
        "full_name"             -> JStr(s"Patient $idx"),
        "identification_number" -> JStr(f"IC$idx%08d"),
        "policy_no"             -> JStr(f"P${rng.nextInt(99999)}%05d")),
      "claim_details" -> obj(
        "visit_type"          -> JStr(if (rng.nextBoolean()) "Inpatient" else "Outpatient"),
        "admission_date_time" -> JStr("2024-05-01 10:00"),
        "discharge_date_time" -> JStr("2024-05-03 12:00"),
        "physician_name"      -> JStr("Dr. Who"),
        "gl_reference_no"     -> JStr(f"GL${rng.nextInt(9999)}%04d")),
      "billing_details" -> obj(
        "ROOM CHARGES" -> obj("ACCOMMODATION" -> items(rng, 1 + rng.nextInt(3))),
        "HOSPITAL MEDICAL SERVICES" -> obj(
          "LABORATORY"       -> items(rng, rng.nextInt(4)),
          "MEDICAL SUPPLIES" -> items(rng, rng.nextInt(3)),
          "PROCEDURES"       -> items(rng, rng.nextInt(2))),
        "CONSULTANT(S) FEES" -> obj(
          "Dr. A" -> obj("CONSULTATION FEES" -> items(rng, 1)),
          "Dr. B" -> obj(
            "CONSULTATION FEES" -> items(rng, rng.nextInt(2)),
            "PROCEDURE FEES"    -> items(rng, rng.nextInt(2))))),
      "financial_information" -> obj(
        "total_room_charges"              -> JStr(money(rng)),
        "total_hospital_medical_services" -> JStr(money(rng)),
        "total_hospital_charges"          -> JStr(money(rng)),
        "total_consultant_fees"           -> JStr(money(rng)),
        "grand_total"                     -> JStr(money(rng))))
  }

  /** Prediction = normalized golden with deterministic defects.
    * `defectRate` 0.0 → byte-equivalent semantics → accuracy 1.0. Noise
    * that must NOT count as a defect (case flips, whitespace pads, comma
    * stripping, +0.005 amount shifts) is always applied. */
  def prediction(idx: Long, seed: Long, defectRate: Double): JObj = {
    val rng  = new Random(mix(seed ^ 0x5DEECE66DL, idx))
    val norm = graft.eval.Normalize.groundTruthToResponse(groundTruth(idx, seed))

    def noiseStr(s: String): String = rng.nextInt(4) match {
      case 0 => s.toUpperCase
      case 1 => s"  $s "
      case 2 => s.toLowerCase
      case _ => s
    }
    def noiseNum(s: String): String =
      graft.functions.Kernels.scala_.tryParseNumber(s) match {
        case Some(v) => (v + 0.005).toString // inside ±0.01
        case None    => noiseStr(s)
      }
    def defectNum(s: String): String =
      graft.functions.Kernels.scala_.tryParseNumber(s) match {
        case Some(v) => (v + 1.5).toString // outside tolerance
        case None    => s + "_wrong"
      }

    def walk(v: J, numeric: Boolean): J = v match {
      case JStr(s) =>
        if (rng.nextDouble() < defectRate) JStr(defectNum(s))
        else JStr(if (numeric) noiseNum(s) else noiseStr(s))
      case JLong(l)    => if (rng.nextDouble() < defectRate) JLong(l + 7) else JLong(l)
      case JArr(xs)    => JArr(rng.shuffle(xs).map(walk(_, numeric)))
      case o: JObj =>
        JObj(o.fields.map { case (k, fv) =>
          val isNum = k.contains("amount") || k.contains("discount") || k.startsWith("total")
          k -> walk(fv, isNum)
        })
      case other => other
    }
    walk(norm, numeric = false).asInstanceOf[JObj]
  }

  /** The 9 flat scalar leaves of the normalized response shape
    * (Normalize.groundTruthToResponse output), in emission order. */
  private val FlatKeys = Vector(
    "format", "bill_no", "provider_name", "patient_name", "ic/passport_no",
    "visit_type", "admission_date_time", "discharge_date_time", "gl_reference_no")

  /** Planted-defect prediction with KNOWN defect counts — the generator
    * side of the driver-checkable eval oracle. Tolerance-covered noise
    * (case flips, pads, ±0.005 shifts, list shuffles) is applied
    * everywhere via [[prediction]] (defectRate 0), then exactly
    * `nMismatched` value defects and `nMissing` dropped keys are planted
    * in the flat scalar leaves — never inside line-item lists, so greedy
    * alignment stays provably perfect (items within a list always differ
    * in `service_code`, so the true twin's similarity 1.0 is a strict
    * maximum) and the expected Compare verdict is exact by construction:
    *
    *   total = 9 + 7 × (line items), correct = total − nMissing − nMismatched.
    *
    * Returns (prediction, expectedTotal, nMissing, nMismatched). The
    * independent path is Compare.scala DETECTING these counts through all
    * the noise; this generator only declares what it planted.
    */
  def plantedPrediction(idx: Long, seed: Long): (JObj, Int, Int, Int) = {
    val nMismatched = if (idx % 2 == 0) 0 else (idx % 3).toInt + 1       // 1..3
    val nMissing    = if (idx % 2 == 0) 0 else ((idx / 3) % 3).toInt     // 0..2
    val noised      = prediction(idx, seed, 0.0)

    def lineItems(v: J): Int = v match {
      case o: JObj  => o.fields.map(f => lineItems(f._2)).sum
      case JArr(xs) => xs.size
      case _        => 0
    }
    val norm  = graft.eval.Normalize.groundTruthToResponse(groundTruth(idx, seed))
    val items = Vector("room_charges", "hospital_medical_services", "consultation_fees")
      .map(k => lineItems(norm.get(k).getOrElse(JNull))).sum
    val total = FlatKeys.size + Normalize_LineItemFieldCount * items

    val mismatchKeys = FlatKeys.take(nMismatched).toSet
    val missingKeys  = FlatKeys.takeRight(nMissing).toSet
    val planted = JObj(noised.fields.flatMap {
      case (k, _) if missingKeys.contains(k)  => None
      case (k, v) if mismatchKeys.contains(k) => Some(k -> (JStr(J.pyStr(v) + "_wrong"): J))
      case kv                                 => Some(kv)
    })
    (planted, total, nMissing, nMismatched)
  }

  /** 7 fields per normalized line item (Normalize.LineItemFields). */
  private val Normalize_LineItemFieldCount = 7
}
