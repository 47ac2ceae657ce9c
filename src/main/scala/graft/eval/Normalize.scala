package graft.eval

import graft.eval.J._
import graft.functions.Kernels.scala_.{normalizeSubcat, parseNumber, parseQty}

/** The reference's two restructuring operators, behavior-equivalent:
  *
  *  - `normalize_ground_truth_to_response` (EP2 input shaping,
  *    /root/reference/eval_script_field_level.py:317-371): nested 5-section
  *    ground truth → flat response-shape record with fixed subcategory
  *    buckets.
  *  - `convert_file` (EP3, /root/reference/convert_ground_truth.py:64-121):
  *    nested ground truth → flat BILLING_CATEGORY list +
  *    BILLING_SUBCATEGORY_DETAILS buckets + parsed financial totals.
  */
object Normalize {

  /** 22 whitelisted hospital subcategories + 3 consult subcategories
    * (eval_script_field_level.py:70-78). */
  val HospitalSubcats: Vector[String] = Vector(
    "DIAGNOSTIC SERVICES", "DRUGS FORMULARY", "EMERGENCY MEDICAL SERVICE", "EQUIPMENT USAGE",
    "GENERAL SUPPLIES", "HOSPITAL SUPPORT FEES", "LABORATORY", "MEDICAL GASES",
    "MEDICAL RECORD SERVICES", "MEDICAL SUPPLIES", "NURSING SERVICES", "OPERATING ROOM FEE",
    "OPERATING THEATER FEES", "OT SERVICES", "OT SUPPLIES & CONSUMABLES", "OT-SUPPORT",
    "PACKAGE", "PPE SUPPLIES", "PROCEDURES", "RADIOGRAPHY SUPPLIES",
    "STERILE ITEMS AND SETS", "SURGICAL SUPPLIES")

  val ConsultSubcats: Vector[String] = Vector("CONSULTATION FEES", "PROCEDURE FEES", "REPORTING FEES")

  /** Normalized-name whitelist for EP3 bucketing
    * (convert_ground_truth.py:10-37). */
  val AllowedSubcats: Set[String] = Set(
    "ACCOMMODATION", "MEDICAL_RECORD_SERVICES", "HOSPITAL_SUPPORT_FEES", "GENERAL_SUPPLIES",
    "RADIOGRAPHY_SUPPLIES", "SURGICAL_SUPPLIES", "DRUGS_FORMULARY", "MEDICAL_SUPPLIES",
    "LABORATORY", "DIAGNOSTIC_SERVICES", "NURSING_SERVICES", "EMERGENCY_MEDICAL_SERVICE",
    "EQUIPMENT_USAGE", "MEDICAL_GASES", "OPERATING_ROOM_FEE", "OPERATING_THEATER_FEES",
    "OT_SUPPORT", "OT_SERVICES", "OT_SUPPLIES_CONSUMABLES", "PACKAGE", "PPE_SUPPLIES",
    "PROCEDURES", "STERILE_ITEMS_AND_SETS", "PROCEDURE_FEES", "CONSULTATION_FEES",
    "REPORTING_FEES")

  private val LineItemFields =
    Vector("service_code", "description", "date", "quantity", "gross_amount", "discount", "allocated_amount")

  /** _get_ci (eval_script_field_level.py:290-297): case-insensitive key
    * lookup — first matching key in insertion order wins. */
  def getCi(d: J, key: String): Option[J] = d match {
    case o: JObj =>
      val want = key.trim.toLowerCase
      o.fields.collectFirst { case (k, v) if k.trim.toLowerCase == want => v }
    case _ => None
  }

  /** _ensure_line_items (eval_script_field_level.py:299-315): coerce any
    * list to fixed 7-string-field items; non-dicts dropped; missing
    * fields → "". */
  def ensureLineItems(items: Option[J]): JArr = items match {
    case Some(JArr(xs)) =>
      JArr(xs.collect { case li: JObj =>
        JObj(LineItemFields.map(f => f -> JStr(li.get(f).map(pyStr).getOrElse(""))))
      })
    case _ => JArr(Vector.empty)
  }

  private def sectionStr(sec: Option[J], key: String): J =
    JStr(sec.flatMap { case o: JObj => o.get(key); case _ => None }.map(pyStr).getOrElse(""))

  /** normalize_ground_truth_to_response (eval_script_field_level.py:317-371). */
  def groundTruthToResponse(gt: J): JObj = {
    val o    = gt match { case x: JObj => x; case _ => JObj(Vector.empty) }
    val doc  = o.get("document_details")
    val pat  = o.get("patient_information")
    val clm  = o.get("claim_details")
    val bill = o.get("billing_details").getOrElse(JNull)

    val roomSrc = getCi(bill, "ROOM CHARGES").getOrElse(JNull)
    val roomOut = obj("ACCOMMODATION" -> ensureLineItems(getCi(roomSrc, "ACCOMMODATION")))

    val hmsSrc = getCi(bill, "HOSPITAL MEDICAL SERVICES").getOrElse(JNull)
    val hmsOut = JObj(HospitalSubcats.map(sub => sub -> (ensureLineItems(getCi(hmsSrc, sub)): J)))

    val consultSrc = getCi(bill, "CONSULTANT(S) FEES").getOrElse(JNull)
    val consultOut: JObj = consultSrc match {
      case consultants: JObj =>
        val acc = scala.collection.mutable.LinkedHashMap[String, Vector[J]](
          ConsultSubcats.map(_ -> Vector.empty[J]): _*)
        consultants.fields.foreach {
          case (_, buckets: JObj) =>
            ConsultSubcats.foreach { sub =>
              acc(sub) = acc(sub) ++ ensureLineItems(getCi(buckets, sub)).items
            }
          case _ => // non-dict consultant bucket skipped (:352-353)
        }
        JObj(acc.toVector.map { case (k, v) => k -> (JArr(v): J) })
      case _ => JObj(ConsultSubcats.map(s => s -> (JArr(Vector.empty): J)))
    }

    obj(
      "format"              -> sectionStr(doc, "format"),
      "bill_no"             -> sectionStr(doc, "bill_no"),
      "provider_name"       -> sectionStr(doc, "provider_name"),
      "patient_name"        -> sectionStr(pat, "full_name"),
      "ic/passport_no"      -> sectionStr(pat, "identification_number"),
      "visit_type"          -> sectionStr(clm, "visit_type"),
      "admission_date_time" -> sectionStr(clm, "admission_date_time"),
      "discharge_date_time" -> sectionStr(clm, "discharge_date_time"),
      "gl_reference_no"     -> sectionStr(clm, "gl_reference_no"),
      "room_charges"        -> roomOut,
      "hospital_medical_services" -> hmsOut,
      "consultation_fees"   -> consultOut)
  }

  /** Envelope unwrap (get_base_data, eval_script_field_level.py:94-98):
    * use obj["data"] if it is a dict. */
  def unwrapData(o: J): J = o match {
    case x: JObj => x.get("data") match {
      case Some(d: JObj) => d
      case _             => x
    }
    case other => other
  }

  /** convert_file core (convert_ground_truth.py:64-121): nested GT →
    * `{"status":"success","data":{...}}` with the flat BILLING_CATEGORY
    * list, BILLING_SUBCATEGORY_DETAILS buckets, and parsed totals.
    *
    * Faithful quirks: only ONE nesting level is walked (cat → subcat →
    * list), so consultant-level map-of-map subtrees are skipped entirely
    * (`isinstance(items, list)` fails for them, :84-85); unknown subcats
    * reach the flat list but not the buckets (:97-99); bucket key order in
    * the reference is Python-set order (arbitrary) — we emit sorted keys,
    * a deterministic refinement that canonical comparison ignores. */
  def convertGroundTruth(gt: J): JObj = {
    val o    = gt match { case x: JObj => x; case _ => JObj(Vector.empty) }
    val doc  = o.get("document_details")
    val pat  = o.get("patient_information")
    val clm  = o.get("claim_details")
    val bill = o.get("billing_details")
    val fin  = o.get("financial_information")

    val buckets = scala.collection.mutable.LinkedHashMap[String, Vector[J]](
      AllowedSubcats.toVector.sorted.map(_ -> Vector.empty[J]): _*)
    val flat = Vector.newBuilder[J]

    def qtyJ(x: Option[J]): J = parseQty(x.map(pyStr).getOrElse("0")) match {
      case Left(l)  => JLong(l)
      case Right(d) => JDouble(d)
    }
    def numJ(x: Option[J]): J = JDouble(parseNumber(x.map(pyStr).getOrElse("0")))
    def strJ(li: JObj, k: String): J = JStr(li.get(k).map(pyStr).getOrElse(""))

    bill.foreach {
      case cats: JObj =>
        cats.fields.foreach {
          case (_, subcats: JObj) =>
            subcats.fields.foreach {
              case (subName, JArr(items)) =>
                val norm = normalizeSubcat(subName)
                items.foreach {
                  case li: JObj =>
                    val item = obj(
                      "service_code"           -> strJ(li, "service_code"),
                      "description_of_service" -> strJ(li, "description"),
                      "date"                   -> strJ(li, "date"),
                      "qty"                    -> qtyJ(li.get("quantity")),
                      "gross_amount"           -> numJ(li.get("gross_amount")),
                      "discount"               -> numJ(li.get("discount")),
                      "allocated_amount"       -> numJ(li.get("allocated_amount")))
                    flat += item
                    if (AllowedSubcats.contains(norm))
                      buckets(norm) = buckets(norm) :+ (item: J)
                  case _ =>
                }
              case _ => // non-list subcat values (consultant nesting) skipped
            }
          case _ =>
        }
      case _ =>
    }

    def finNum(key: String): J =
      JDouble(parseNumber(fin.flatMap { case f: JObj => f.get(key); case _ => None }
        .map(pyStr).getOrElse("0")))

    obj(
      "status" -> JStr("success"),
      "data" -> obj(
        "FORMAT"              -> sectionStr(doc, "format"),
        "BILL_NO"             -> sectionStr(doc, "bill_no"),
        "PATIENT_NAME"        -> sectionStr(pat, "full_name"),
        "IC_PASSPORT_NO"      -> sectionStr(pat, "identification_number"),
        "VISIT_TYPE"          -> sectionStr(clm, "visit_type"),
        "ADMISSION_DATE_TIME" -> sectionStr(clm, "admission_date_time"),
        "DISCHARGE_DATE_TIME" -> sectionStr(clm, "discharge_date_time"),
        "GL_REFERENCE_NO"     -> sectionStr(clm, "gl_reference_no"),
        "BILLING_CATEGORY"    -> JArr(flat.result()),
        "BILLING_SUBCATEGORY_DETAILS" -> JObj(buckets.toVector.map { case (k, v) => k -> (JArr(v): J) }),
        "TOTAL_ROOM_CHARGES"  -> finNum("total_room_charges"),
        "TOTAL_HOSPITAL_MEDICAL_SERVICES" -> finNum("total_hospital_medical_services"),
        "TOTAL_HOSPITAL_CHARGES" -> finNum("total_hospital_charges"),
        "TOTAL_CONSULTANT_FEES"  -> finNum("total_consultant_fees"),
        "GRAND_TOTAL"            -> finNum("grand_total")))
  }
}
