"""FHIR R4 bundle parsing → structured + unstructured documents.

Capability parity with reference ``parse_fhir_bundle`` (app/main.py:594-1155):
each bundle entry of the 9 supported resource types yields

- one *structured* doc: the typed field schema of core/schema.py
  (doc_id ``{rtype}-{rid}-structured``), and
- zero or more *unstructured* docs: narrative text collected from ``text.div``
  and ``note[]`` (plus resource-specific prose), chunked by chunk_size words
  (doc_id ``{rtype}-{rid}-unstructured-{i}``).

The implementation is table-driven rather than one 500-line function: each
resource type declares its field extractors, and narrative collection is a
shared path.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Callable

from rassengine_tpu.core.schema import STRUCTURED_FIELDS as _ALL_STRUCTURED_FIELDS
from rassengine_tpu.ingest.chunker import chunk_text

FILE_TYPE_JSON = "json"

log = logging.getLogger("rassengine.ingest.fhir")

_TAG_RE = re.compile(r"<[^>]+>")


def _strip_html(text: str) -> str:
    return re.sub(r"\s+", " ", _TAG_RE.sub(" ", text or "")).strip()


def extract_code_text(code: Any) -> str | None:
    """CodeableConcept → display text (reference extract_code_text, main.py:585)."""
    if not isinstance(code, dict):
        return str(code) if code else None
    if code.get("text"):
        return str(code["text"])
    for coding in code.get("coding", []) or []:
        if coding.get("display"):
            return str(coding["display"])
        if coding.get("code"):
            return str(coding["code"])
    return None


def _human_name(name_list) -> str | None:
    if not name_list:
        return None
    n = name_list[0] or {}
    if n.get("text"):
        return str(n["text"])
    parts = list(n.get("given", []) or []) + ([n.get("family")] if n.get("family") else [])
    return " ".join(str(p) for p in parts) or None


def _address(addr_list) -> str | None:
    if not addr_list:
        return None
    a = addr_list[0] or {}
    parts = list(a.get("line", []) or []) + [a.get(k) for k in ("city", "state", "postalCode", "country")]
    return ", ".join(str(p) for p in parts if p) or None


def _telecom(tel_list) -> str | None:
    if not tel_list:
        return None
    vals = [t.get("value") for t in tel_list if isinstance(t, dict) and t.get("value")]
    return " | ".join(str(v) for v in vals) or None


def _ref_id(ref: Any) -> str | None:
    """'Patient/123' or 'urn:uuid:...' → bare id."""
    if isinstance(ref, dict):
        ref = ref.get("reference")
    if not ref:
        return None
    s = str(ref)
    if "/" in s:
        return s.rsplit("/", 1)[-1]
    if s.startswith("urn:uuid:"):
        return s[len("urn:uuid:"):]
    return s


def _notes(resource) -> list[str]:
    out = []
    for n in resource.get("note", []) or []:
        if isinstance(n, dict) and n.get("text"):
            out.append(str(n["text"]))
    return out


def _obs_value(resource) -> tuple[str | None, str | None]:
    """Observation value + unit from the valueX choice."""
    vq = resource.get("valueQuantity")
    if isinstance(vq, dict) and vq.get("value") is not None:
        return str(vq["value"]), vq.get("unit") or vq.get("code")
    if resource.get("valueString") is not None:
        return str(resource["valueString"]), None
    if resource.get("valueCodeableConcept") is not None:
        return extract_code_text(resource["valueCodeableConcept"]), None
    if resource.get("valueInteger") is not None:
        return str(resource["valueInteger"]), None
    if resource.get("valueBoolean") is not None:
        return str(resource["valueBoolean"]), None
    return None, None


def _ref_range(resource) -> str | None:
    rr = resource.get("referenceRange", []) or []
    if not rr:
        return None
    r = rr[0]
    lo = (r.get("low") or {}).get("value")
    hi = (r.get("high") or {}).get("value")
    if lo is None and hi is None:
        return r.get("text")
    return f"{lo if lo is not None else '?'} - {hi if hi is not None else '?'}"


def _period(p, key) -> str | None:
    return (p or {}).get(key)


# per-resource extractors: field name → fn(resource) -> str|None
def _patient_fields(r) -> dict:
    lang = None
    comms = r.get("communication", []) or []
    if comms:
        lang = extract_code_text(comms[0].get("language"))
    return {
        "patientId": r.get("id"),
        "patientName": _human_name(r.get("name")),
        "patientGender": r.get("gender"),
        "patientDOB": r.get("birthDate"),
        "patientAddress": _address(r.get("address")),
        "patientMaritalStatus": extract_code_text(r.get("maritalStatus")),
        "patientMultipleBirth": str(r["multipleBirthBoolean"]) if "multipleBirthBoolean" in r
        else (str(r["multipleBirthInteger"]) if "multipleBirthInteger" in r else None),
        "patientTelecom": _telecom(r.get("telecom")),
        "patientLanguage": lang,
    }


def _condition_fields(r) -> dict:
    cats = r.get("category", []) or []
    return {
        "conditionId": r.get("id"),
        "conditionCodeText": extract_code_text(r.get("code")),
        "conditionCategory": extract_code_text(cats[0]) if cats else None,
        "conditionClinicalStatus": extract_code_text(r.get("clinicalStatus")),
        "conditionVerificationStatus": extract_code_text(r.get("verificationStatus")),
        "conditionOnsetDateTime": r.get("onsetDateTime"),
        "conditionRecordedDate": r.get("recordedDate"),
        "conditionSeverity": extract_code_text(r.get("severity")),
        "conditionNote": " ".join(_notes(r)) or None,
    }


def _observation_fields(r) -> dict:
    val, unit = _obs_value(r)
    interps = r.get("interpretation", []) or []
    return {
        "observationId": r.get("id"),
        "observationCodeText": extract_code_text(r.get("code")),
        "observationValue": val,
        "observationUnit": unit,
        "observationInterpretation": extract_code_text(interps[0]) if interps else None,
        "observationEffectiveDateTime": r.get("effectiveDateTime"),
        "observationIssued": r.get("issued"),
        "observationReferenceRange": _ref_range(r),
        "observationNote": " ".join(_notes(r)) or None,
    }


def _encounter_fields(r) -> dict:
    types = r.get("type", []) or []
    reasons = r.get("reasonCode", []) or []
    locs = r.get("location", []) or []
    parts = r.get("participant", []) or []
    part_names = [
        (p.get("individual") or {}).get("display")
        for p in parts if isinstance(p, dict)
    ]
    return {
        "encounterId": r.get("id"),
        "encounterStatus": r.get("status"),
        "encounterClass": (r.get("class") or {}).get("code")
        if isinstance(r.get("class"), dict) else r.get("class"),
        "encounterType": extract_code_text(types[0]) if types else None,
        "encounterReasonCode": extract_code_text(reasons[0]) if reasons else None,
        "encounterStart": _period(r.get("period"), "start"),
        "encounterEnd": _period(r.get("period"), "end"),
        "encounterLocation": (locs[0].get("location") or {}).get("display") if locs else None,
        "encounterServiceProvider": (r.get("serviceProvider") or {}).get("display"),
        "encounterParticipant": " | ".join(str(n) for n in part_names if n) or None,
        "encounterNote": " ".join(_notes(r)) or None,
    }


def _medrequest_fields(r) -> dict:
    dosages = r.get("dosageInstruction", []) or []
    dosage_texts = [d.get("text") for d in dosages if isinstance(d, dict) and d.get("text")]
    disp = r.get("dispenseRequest") or {}
    disp_qty = (disp.get("quantity") or {}).get("value")
    med = r.get("medicationCodeableConcept") or (r.get("medicationReference") or {}).get("display")
    return {
        "medRequestId": r.get("id"),
        "medRequestMedicationDisplay": extract_code_text(med) if isinstance(med, dict) else med,
        "medRequestAuthoredOn": r.get("authoredOn"),
        "medRequestIntent": r.get("intent"),
        "medRequestStatus": r.get("status"),
        "medRequestPriority": r.get("priority"),
        "medRequestDosageInstruction": " | ".join(dosage_texts) or None,
        "medRequestDispenseRequest": str(disp_qty) if disp_qty is not None else None,
        "medRequestNote": " ".join(_notes(r)) or None,
    }


def _procedure_fields(r) -> dict:
    fups = r.get("followUp", []) or []
    return {
        "procedureId": r.get("id"),
        "procedureCodeText": extract_code_text(r.get("code")),
        "procedureStatus": r.get("status"),
        "procedurePerformedDateTime": r.get("performedDateTime")
        or _period(r.get("performedPeriod"), "start"),
        "procedureFollowUp": extract_code_text(fups[0]) if fups else None,
        "procedureNote": " ".join(_notes(r)) or None,
    }


def _allergy_fields(r) -> dict:
    cats = r.get("category", []) or []
    return {
        "allergyId": r.get("id"),
        "allergyClinicalStatus": extract_code_text(r.get("clinicalStatus")),
        "allergyVerificationStatus": extract_code_text(r.get("verificationStatus")),
        "allergyType": r.get("type"),
        "allergyCategory": str(cats[0]) if cats else None,
        "allergyCriticality": r.get("criticality"),
        "allergyCodeText": extract_code_text(r.get("code")),
        "allergyOnsetDateTime": r.get("onsetDateTime"),
        "allergyNote": " ".join(_notes(r)) or None,
    }


def _practitioner_fields(r) -> dict:
    quals = r.get("qualification", []) or []
    return {
        "practitionerId": r.get("id"),
        "practitionerName": _human_name(r.get("name")),
        "practitionerGender": r.get("gender"),
        "practitionerSpecialty": extract_code_text(quals[0].get("code")) if quals else None,
        "practitionerAddress": _address(r.get("address")),
        "practitionerTelecom": _telecom(r.get("telecom")),
    }


def _organization_fields(r) -> dict:
    types = r.get("type", []) or []
    return {
        "organizationId": r.get("id"),
        "organizationName": r.get("name"),
        "organizationType": extract_code_text(types[0]) if types else None,
        "organizationAddress": _address(r.get("address")),
        "organizationTelecom": _telecom(r.get("telecom")),
    }


_EXTRACTORS: dict[str, Callable[[dict], dict]] = {
    "Patient": _patient_fields,
    "Condition": _condition_fields,
    "Observation": _observation_fields,
    "Encounter": _encounter_fields,
    "MedicationRequest": _medrequest_fields,
    "Procedure": _procedure_fields,
    "AllergyIntolerance": _allergy_fields,
    "Practitioner": _practitioner_fields,
    "Organization": _organization_fields,
}

# fields whose values are prose worth embedding alongside text.div / note[]
_NARRATIVE_FIELDS = {
    "Condition": ("conditionCodeText", "conditionNote"),
    "Observation": ("observationCodeText", "observationValue", "observationNote"),
    "Encounter": ("encounterType", "encounterReasonCode", "encounterNote"),
    "MedicationRequest": ("medRequestMedicationDisplay", "medRequestDosageInstruction", "medRequestNote"),
    "Procedure": ("procedureCodeText", "procedureNote"),
    "AllergyIntolerance": ("allergyCodeText", "allergyNote"),
}


def _resolve_patient_id(rtype: str, resource: dict, fields: dict) -> str | None:
    if rtype == "Patient":
        return resource.get("id")
    for key in ("subject", "patient"):
        pid = _ref_id(resource.get(key))
        if pid:
            return pid
    return None


def parse_fhir_bundle(bundle: dict, chunk_size: int = 512,
                      file_path: str | None = None, *, adaptive: bool = False,
                      overlap: int = 0) -> tuple[list[dict], list[dict]]:
    """Parse a FHIR bundle → (structured_docs, unstructured_docs)."""
    structured: list[dict] = []
    unstructured: list[dict] = []
    entries = bundle.get("entry", []) or []
    for ei, entry in enumerate(entries):
        resource = (entry or {}).get("resource") or {}
        rtype = resource.get("resourceType")
        extractor = _EXTRACTORS.get(rtype)
        if extractor is None:
            continue
        rid = resource.get("id") or f"entry{ei}"
        try:
            fields = extractor(resource)
            patient_id = _resolve_patient_id(rtype, resource, fields)
            if patient_id is not None and not isinstance(patient_id, str):
                patient_id = str(patient_id)
            text = resource.get("text")
            div = (text.get("div") if isinstance(text, dict) else None) or ""
        except Exception:  # noqa: BLE001 — one bad entry must not sink the
            # bundle: the reference's ingest loop swallows per-doc errors and
            # keeps indexing (embedding_gen.py zero-vector-on-error spirit);
            # real EHR exports routinely carry vendor-specific field shapes
            log.warning("skipping malformed %s entry %s (rid=%s)",
                        rtype, ei, rid, exc_info=True)
            continue

        sdoc = {f: None for f in _ALL_STRUCTURED_FIELDS}
        sdoc.update(fields)
        sdoc.update({
            "doc_id": f"{rtype}-{rid}-structured",
            "doc_type": "structured",
            "resourceType": rtype,
            "file_path": file_path,
            "file_type": FILE_TYPE_JSON,
            "patientId": patient_id,  # _resolve_patient_id: own id for Patient
        })
        if rtype == "Patient":
            sdoc["patientName"] = fields.get("patientName")
        structured.append(sdoc)

        # narrative collection: text.div + note[] + resource-specific prose
        pieces: list[str] = []
        if isinstance(div, str) and div.strip():
            pieces.append(_strip_html(div))
        for fname in _NARRATIVE_FIELDS.get(rtype, ()):
            v = fields.get(fname)
            if v:
                pieces.append(str(v))
        narrative = " ".join(p for p in pieces if p).strip()
        if narrative:
            for ci, chunk in enumerate(chunk_text(narrative, chunk_size,
                                                  adaptive=adaptive,
                                                  overlap=overlap)):
                unstructured.append({
                    "doc_id": f"{rtype}-{rid}-unstructured-{ci}",
                    "doc_type": "unstructured",
                    "resourceType": rtype,
                    "patientId": sdoc["patientId"],
                    "file_path": file_path,
                    "file_type": FILE_TYPE_JSON,
                    "unstructuredText": chunk,
                })
    return structured, unstructured


def parse_fhir_bundle_with_path(bundle: dict, file_path: str,
                                chunk_size: int = 512, *,
                                adaptive: bool = False,
                                overlap: int = 0) -> tuple[list[dict], list[dict]]:
    """Reference parse_fhir_bundle_with_path (main.py:1135-1155)."""
    return parse_fhir_bundle(bundle, chunk_size=chunk_size,
                             file_path=file_path, adaptive=adaptive,
                             overlap=overlap)
