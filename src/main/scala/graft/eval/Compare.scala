package graft.eval

import graft.eval.J._

/** Faithful replica of the reference's deterministic field-level diff
  * (/root/reference/eval_script_field_level.py:104-315): recursive
  * golden-vs-prediction comparison with tolerance rules, greedy
  * best-match alignment for unordered line-item lists, and multiset
  * comparison for scalar lists. This is the J2/J3/SO1/A1/A2 operator set
  * from SURVEY.md §2, UDTF-shaped: one document in, leaf verdicts out.
  *
  * Intentionally preserved quirks (SURVEY.md §7.5 item 3):
  *  - empty-STRING GT wildcard (None is not a wildcard), :134-137
  *  - numeric tolerance = math.isclose(abs_tol=0.01) incl. rel_tol, :120-125
  *  - greedy alignment, strict '>' keeps the earliest candidate, :186-192
  *  - count_leafs approximations for absent subtrees (empty list = 1 leaf;
  *    list-of-dicts = Σ field counts), :225-237
  *  - gt-dict-vs-non-dict counts one unit per KEY, not per leaf, :214-219
  *  - scalar-list multiset equality is exact serialized equality, NOT
  *    scalar_equal, :262-281
  */
object Compare {

  final case class Diff(correct: Int, total: Int, mismatches: Vector[String], missing: Vector[String]) {
    def ++(o: Diff): Diff =
      Diff(correct + o.correct, total + o.total, mismatches ++ o.mismatches, missing ++ o.missing)
  }
  object Diff { val zero: Diff = Diff(0, 0, Vector.empty, Vector.empty) }

  private def tryParseNumber(x: J): Option[Double] = x match {
    case JNull      => None
    case JLong(l)   => Some(l.toDouble)
    case JDouble(d) => Some(d)
    case JBool(b)   => Some(if (b) 1.0 else 0.0) // Python str(True)="True" → not a number… see below
    case _          => graft.functions.Kernels.scala_.tryParseNumber(pyStr(x))
  }

  private def isNumber(x: J): Boolean = x match {
    // Python _try_parse_number does str(x): str(True)="True" → float fails
    case JBool(_) => false
    case JNull    => false
    case _        => tryParseNumber(x).isDefined
  }

  private def numEqual(a: J, b: J): Boolean =
    (tryParseNumber(a), tryParseNumber(b)) match {
      case (Some(x), Some(y)) => graft.functions.Kernels.scala_.isClose(x, y)
      case _                  => false
    }

  private def normalizeStr(x: J): String = x match {
    case JNull => ""
    case other => graft.functions.Kernels.scala_.normalizeStr(pyStr(other))
  }

  /** scalar_equal (:134-142). The wildcard applies only when GT is a
    * string whose normalization is empty. */
  def scalarEqual(gt: J, pred: J): Boolean = gt match {
    case JStr(s) if graft.functions.Kernels.scala_.normalizeStr(s).isEmpty => true
    case _ =>
      if (isNumber(gt) && isNumber(pred)) numEqual(gt, pred)
      else normalizeStr(gt) == normalizeStr(pred)
  }

  /** count_leafs (:225-237) — the denominator approximation for subtrees
    * absent from the prediction. */
  def countLeafs(x: J): Int = x match {
    case o: JObj                            => o.fields.map(f => countLeafs(f._2)).sum
    case JArr(items) if items.isEmpty       => 1
    case JArr(items) =>
      items.head match {
        case _: JObj => items.map { case o: JObj => o.fields.size; case _ => 0 }.sum
        case _       => items.size
      }
    case _ => 1
  }

  /** item_similarity (:161-173): fraction of GT fields equal in the
    * prediction item; 0 for non-dict prediction or empty GT item. */
  def itemSimilarity(gtItem: JObj, prItem: J): Double = prItem match {
    case pr: JObj if gtItem.fields.nonEmpty =>
      val matches = gtItem.fields.count { case (k, v) =>
        pr.get(k).exists(scalarEqual(v, _))
      }
      matches.toDouble / gtItem.fields.size
    case _ => 0.0
  }

  /** compare_items (:144-159): field-by-field diff of two aligned items. */
  private def compareItems(gtItem: JObj, prItem: JObj, path: String): Diff =
    gtItem.fields.foldLeft(Diff.zero) { case (acc, (k, v)) =>
      val p = if (path.nonEmpty) s"$path.$k" else k
      prItem.get(k) match {
        case None => acc ++ Diff(0, 1, Vector.empty, Vector(p))
        case Some(pv) =>
          if (scalarEqual(v, pv)) acc ++ Diff(1, 1, Vector.empty, Vector.empty)
          else acc ++ Diff(0, 1, Vector(p), Vector.empty)
      }
    }

  /** compare_lists_of_dicts (:175-206): greedy best-match alignment.
    * For each GT item in order, the unused prediction item with the
    * highest similarity wins; strict '>' keeps the earliest candidate on
    * ties. GT items with no remaining candidate report every field
    * missing. Extra prediction items are ignored. */
  private def compareListsOfDicts(gtList: Vector[J], prList: Vector[J], path: String): Diff = {
    val used = scala.collection.mutable.Set.empty[Int]
    gtList.zipWithIndex.foldLeft(Diff.zero) {
      case (acc, (gtItem: JObj, i)) =>
        var bestJ     = -1
        var bestScore = -1.0
        var j         = 0
        while (j < prList.length) {
          if (!used.contains(j)) {
            val score = itemSimilarity(gtItem, prList(j))
            if (score > bestScore) { bestScore = score; bestJ = j }
          }
          j += 1
        }
        if (bestJ == -1) {
          acc ++ Diff(0, gtItem.fields.size, Vector.empty,
            gtItem.fields.map { case (k, _) => s"$path[$i].$k" })
        } else {
          used += bestJ
          prList(bestJ) match {
            case pr: JObj => acc ++ compareItems(gtItem, pr, s"$path[$i]")
            case other =>
              // non-dict best match: compare_items iterates gt keys; every
              // key is "missing" from a non-dict — reference can't reach
              // this (similarity 0 still selects it, then .get fails);
              // Python would TypeError; our corpus never produces it
              acc ++ Diff(0, gtItem.fields.size, Vector.empty,
                gtItem.fields.map { case (k, _) => s"$path[$i].$k" })
          }
        }
      case (acc, _) => acc // non-dict GT item inside a dict-list: skipped
    }
  }

  /** compare_json (:208-288). */
  def compareJson(gt: J, pred: J, path: String = ""): Diff = gt match {
    case gtObj: JObj =>
      pred match {
        case predObj: JObj =>
          gtObj.fields.foldLeft(Diff.zero) { case (acc, (k, v)) =>
            val p = if (path.nonEmpty) s"$path.$k" else k
            predObj.get(k) match {
              case None     => acc ++ Diff(0, countLeafs(v), Vector.empty, Vector(p))
              case Some(pv) => acc ++ compareJson(v, pv, p)
            }
          }
        case _ =>
          // everything under gt missing; total counts KEYS (not leaves)
          Diff(0, gtObj.fields.size, Vector.empty,
            gtObj.fields.map { case (k, _) => s"$path.$k".replaceAll("^\\.+", "") })
      }

    case JArr(gtItems) =>
      pred match {
        case JArr(prItems) =>
          if (gtItems.isEmpty) Diff.zero
          else gtItems.head match {
            case _: JObj => compareListsOfDicts(gtItems, prItems, path)
            case _ =>
              // scalar list: multiset compare on canonical serialization
              val prCounts = scala.collection.mutable.Map.empty[String, Int]
              prItems.foreach { v =>
                val k = canonical(v); prCounts.update(k, prCounts.getOrElse(k, 0) + 1)
              }
              gtItems.zipWithIndex.foldLeft(Diff(0, gtItems.size, Vector.empty, Vector.empty)) {
                case (acc, (v, i)) =>
                  val k = canonical(v)
                  if (prCounts.getOrElse(k, 0) > 0) {
                    prCounts.update(k, prCounts(k) - 1)
                    acc.copy(correct = acc.correct + 1)
                  } else acc.copy(mismatches = acc.mismatches :+ s"$path[$i]")
              }
          }
        case _ =>
          // GT list vs non-list prediction: one "[]" missing path; total
          // estimated like count_leafs but with 0 for the empty list
          val total = gtItems.headOption match {
            case Some(_: JObj) => gtItems.map { case o: JObj => o.fields.size; case _ => 0 }.sum
            case _             => gtItems.size
          }
          Diff(0, total, Vector.empty, Vector(s"$path[]"))
      }

    case scalar =>
      if (scalarEqual(scalar, pred)) Diff(1, 1, Vector.empty, Vector.empty)
      else Diff(0, 1, Vector(path), Vector.empty)
  }

  /** Per-file metrics from a Diff (evaluate_one, :404-424). */
  final case class Metrics(
      accuracy: Double, schemaAccuracy: Double, valuesAccuracy: Double,
      missingCount: Int, mismatchedCount: Int,
      missingFields: String, mismatchedFields: String)

  def metrics(d: Diff): Metrics = {
    val schemaTotal  = d.total
    val presentTotal = math.max(schemaTotal - d.missing.size, 0)
    // Python round() is banker's rounding (half-to-even)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    Metrics(
      accuracy       = if (schemaTotal > 0) r4(d.correct.toDouble / schemaTotal) else 0.0,
      schemaAccuracy = if (schemaTotal > 0) r4(presentTotal.toDouble / schemaTotal) else 0.0,
      valuesAccuracy = if (presentTotal > 0) r4(d.correct.toDouble / presentTotal) else 0.0,
      missingCount   = d.missing.size,
      mismatchedCount = d.mismatches.size,
      missingFields  = d.missing.mkString(";"),
      mismatchedFields = d.mismatches.mkString(";"))
  }
}
