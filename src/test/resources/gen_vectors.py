import sys, types, json
# stub 'requests' so the module imports without network libs
sys.modules['requests'] = types.ModuleType('requests')
sys.path.insert(0, '/root/reference')
import importlib.util
spec = importlib.util.spec_from_file_location("refeval", "/root/reference/eval_script_field_level.py")
ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref)
spec2 = importlib.util.spec_from_file_location("refconv", "/root/reference/convert_ground_truth.py")
conv = importlib.util.module_from_spec(spec2)
spec2.loader.exec_module(conv)

out = {}

# scalar_equal vectors
se_cases = [
    ("", "anything"), ("  ", "x"), (None, ""), (None, "x"),
    ("1,234.56", "1234.56"), ("(50)", "-50"), ("(50)", "-50.005"),
    ("(50)", "-50.02"), ("1 234", "1234"), ("abc", " ABC  "),
    ("10", "10.009"), ("10", "10.011"), ("0", ""), ("", ""),
    ("((7))", "-7"), ("1e2", "100"), ("inf", "inf"), ("nan", "nan"),
    ("2000000000.0", "2000000002.0"), ("5_0", "50"),
]
out["scalar_equal"] = [[a, b, ref.scalar_equal(a, b)] for a, b in se_cases]

pn_cases = ["", "  ", "1,234.56", "(50)", "( 50 )", "((7))", ")5(", "1 234", "abc", "1e3", "-2.5", "(1,000.25)", "0042", "5_0"]
out["parse_number"] = [[s, conv.parse_number(s)] for s in pn_cases]
out["is_number"] = [[s, ref.is_number(s)] for s in pn_cases]
out["parse_qty"] = [[s, conv.parse_qty(s), isinstance(conv.parse_qty(s), int)] for s in ["5", "5.0", "5.5", "(3)", "abc", ""]]
out["normalize_subcat"] = [[s, conv.normalize_subcat(s)] for s in
    ["OT Supplies & Consumables", "  drugs--formulary ", "__A  B__", "", "ot-support", "PPE Supplies!!"]]
out["normalize_str"] = [[s, ref.normalize_str(s)] for s in ["  A\t b\nC ", None, "", "X  Y"]]

# compare_json vectors on nested structures
gt1 = {
  "format": "Detailed",
  "bill_no": "B-001",
  "provider_name": "",
  "room_charges": {"ACCOMMODATION": [
      {"service_code": "A1", "description": "Ward 2", "date": "2024-01-01", "quantity": "2",
       "gross_amount": "1,200.00", "discount": "(100)", "allocated_amount": "1100.00"},
      {"service_code": "A2", "description": "Ward 3", "date": "2024-01-02", "quantity": "1",
       "gross_amount": "300", "discount": "0", "allocated_amount": "300"}]},
  "tags": ["a", "b", "b", "c"],
  "totals": {"grand": "1,400.00", "sub": "1400"},
}
pred1 = {
  "format": "detailed ",
  "bill_no": "B-002",
  "provider_name": "Some Hospital",
  "room_charges": {"ACCOMMODATION": [
      {"service_code": "A2", "description": "ward 3", "date": "2024-01-02", "quantity": "1.0",
       "gross_amount": "300.005", "discount": "0.0", "allocated_amount": "300"},
      {"service_code": "A1", "description": "Ward 2", "date": "2024-01-01", "quantity": "2",
       "gross_amount": "1200", "discount": "(100.00)", "allocated_amount": "1,100"}]},
  "tags": ["b", "a", "x"],
  "totals": {"grand": "1400.001"},
}
out["compare1"] = list(ref.compare_json(gt1, pred1))

gt2 = {"a": {"b": [{"k1": "1", "k2": "2"}, {"k1": "3", "k2": "4"}], "c": [], "d": ["x","y"]}, "e": "5"}
pred2 = {"e": "5.0"}
out["compare2"] = list(ref.compare_json(gt2, pred2))

gt3 = {"list": [{"f": "1"}, {"f": "2"}, {"f": "3"}]}
pred3 = {"list": [{"f": "2"}]}
out["compare3"] = list(ref.compare_json(gt3, pred3))

gt4 = {"x": ["1", "2"], "y": {"z": "1"}}
pred4 = {"x": "notalist", "y": "notadict"}
out["compare4"] = list(ref.compare_json(gt4, pred4))

# tie-breaking: two identical candidates, greedy keeps earliest
gt5 = {"l": [{"a": "1", "b": "2"}, {"a": "1", "b": "9"}]}
pred5 = {"l": [{"a": "1", "b": "9"}, {"a": "1", "b": "2"}]}
out["compare5"] = list(ref.compare_json(gt5, pred5))

# normalize_ground_truth_to_response + full evaluate metrics
gt_full = {
  "document_details": {"format": "Itemized", "bill_no": "INV-9", "provider_name": "GH"},
  "patient_information": {"full_name": "Jane O'Doe", "identification_number": "A123", "policy_no": "P9"},
  "claim_details": {"visit_type": "Inpatient", "admission_date_time": "2024-05-01 10:00",
                    "discharge_date_time": "2024-05-03 12:00", "physician_name": "Dr. X", "gl_reference_no": "GL7"},
  "billing_details": {
    "Room Charges": {"Accommodation": [
        {"service_code": "RC1", "description": "Deluxe", "date": "2024-05-01", "quantity": 2,
         "gross_amount": "2,000.00", "discount": "(200.00)", "allocated_amount": "1,800.00"}]},
    "HOSPITAL MEDICAL SERVICES": {
      "laboratory": [{"service_code": "L1", "description": "CBC", "date": "2024-05-01", "quantity": 1,
                      "gross_amount": "150", "discount": "0", "allocated_amount": "150"}],
      "Unknown Subcat": [{"service_code": "U1", "description": "x", "date": "", "quantity": 1,
                          "gross_amount": "5", "discount": "0", "allocated_amount": "5"}]},
    "CONSULTANT(S) FEES": {
      "Dr. A": {"Consultation Fees": [{"service_code": "C1", "description": "Visit", "date": "2024-05-02",
                 "quantity": 1, "gross_amount": "120", "discount": "0", "allocated_amount": "120"}]},
      "Dr. B": {"consultation fees": [{"service_code": "C2", "description": "Visit2", "date": "2024-05-03",
                 "quantity": 1, "gross_amount": "80", "discount": "0", "allocated_amount": "80"}],
                "Procedure Fees": [{"service_code": "P1", "description": "Proc", "date": "2024-05-02",
                 "quantity": 1, "gross_amount": "900", "discount": "(50)", "allocated_amount": "850"}]}}},
  "financial_information": {"total_room_charges": "1,800.00", "total_hospital_medical_services": "155",
     "total_hospital_charges": "1,955.00", "total_consultant_fees": "1,050.00", "grand_total": "(3,005.00)"},
}
out["gt_normalized"] = ref.normalize_ground_truth_to_response(gt_full)
out["gt_converted"] = conv.convert_file.__wrapped__(gt_full) if hasattr(conv.convert_file, '__wrapped__') else None
# convert_file reads from disk; replicate its body via a temp file
import tempfile, os
with tempfile.NamedTemporaryFile('w', suffix='.json', delete=False) as f:
    json.dump(gt_full, f)
    tmp = f.name
out["gt_converted"] = conv.convert_file(tmp)
os.unlink(tmp)

# a prediction matching partially, full metrics path
pred_full = ref.normalize_ground_truth_to_response(gt_full)
pred_full["bill_no"] = "INV-8"
del pred_full["gl_reference_no"]
pred_full["room_charges"]["ACCOMMODATION"][0]["gross_amount"] = "2000.005"
c, t, mm, ms = ref.compare_json(ref.normalize_ground_truth_to_response(gt_full), pred_full)
present = max(t - len(ms), 0)
out["metrics_full"] = {
  "correct": c, "total": t, "mismatches": mm, "missing": ms,
  "accuracy": round(c / t, 4) if t else 0.0,
  "schema_accuracy": round(present / t, 4) if t else 0.0,
  "values_accuracy": round(c / present, 4) if present else 0.0,
}

json.dump(out, open('/tmp/refharness/vectors.json', 'w'), indent=1, ensure_ascii=False)
print("wrote", len(out), "vector groups")
