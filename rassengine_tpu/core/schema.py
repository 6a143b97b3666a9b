"""Document schema and intent/entity taxonomies.

The field names reproduce the reference's OpenSearch mapping surface so that
documents, filters, and API payloads are drop-in compatible:

- structured FHIR fields: reference app/main.py:619-708 (parse_fhir_bundle sdoc)
- boosted text fields:    reference app/main.py:1403-1430 (text_fields)
- keyword fields:         reference app/main.py:1431-1456 (keyword_fields)
- date fields:            reference app/main.py:1457-1468 (date_fields)
- entity→field map:       reference app/main.py:192-219 (ENTITY_FIELD_MAP)
- intents:                reference app/main.py:2174-2187

In this framework the schema additionally drives the on-device layout: keyword
fields are dictionary-encoded into int32 columns and date fields into int32
epoch-day columns of the tenant's filter tensor (see index/store.py), so every
filter the reference expresses as an OpenSearch bool clause becomes a vectorized
mask over those columns.
"""

from __future__ import annotations

import datetime as _dt
import enum
import re
from dataclasses import dataclass


class QueryIntent(str, enum.Enum):
    """The 12 retrieval intents (reference app/main.py:2174-2187)."""

    SEMANTIC = "SEMANTIC"
    KEYWORD = "KEYWORD"
    HYBRID = "HYBRID"
    STRUCTURED = "STRUCTURED"
    HYBRID_STRUCTURED = "HYBRID_STRUCTURED"
    AGGREGATE = "AGGREGATE"
    COMPARISON = "COMPARISON"
    TEMPORAL = "TEMPORAL"
    EXPLANATORY = "EXPLANATORY"
    MULTI_INTENT = "MULTI_INTENT"
    ENTITY_SPECIFIC = "ENTITY_SPECIFIC"
    DOCUMENT_FETCH = "DOCUMENT_FETCH"


ALL_INTENTS = [i.value for i in QueryIntent]

# Intents whose strategies consume the query embedding (reference main.py:2878-2886).
EMBEDDING_INTENTS = {
    QueryIntent.SEMANTIC,
    QueryIntent.HYBRID,
    QueryIntent.HYBRID_STRUCTURED,
    QueryIntent.MULTI_INTENT,
}


# --- structured document fields -------------------------------------------------

FHIR_RESOURCE_TYPES = (
    "Patient",
    "Condition",
    "Observation",
    "Encounter",
    "MedicationRequest",
    "Procedure",
    "AllergyIntolerance",
    "Practitioner",
    "Organization",
)

# Every typed field of a structured doc, grouped by resource. Values are always
# strings (or None); the on-device representation is derived from FIELD_KINDS.
STRUCTURED_FIELDS: tuple[str, ...] = (
    # Patient
    "patientId", "patientName", "patientGender", "patientDOB", "patientAddress",
    "patientMaritalStatus", "patientMultipleBirth", "patientTelecom", "patientLanguage",
    # Condition
    "conditionId", "conditionCodeText", "conditionCategory", "conditionClinicalStatus",
    "conditionVerificationStatus", "conditionOnsetDateTime", "conditionRecordedDate",
    "conditionSeverity", "conditionNote",
    # Observation
    "observationId", "observationCodeText", "observationValue", "observationUnit",
    "observationInterpretation", "observationEffectiveDateTime", "observationIssued",
    "observationReferenceRange", "observationNote",
    # Encounter
    "encounterId", "encounterStatus", "encounterClass", "encounterType",
    "encounterReasonCode", "encounterStart", "encounterEnd", "encounterLocation",
    "encounterServiceProvider", "encounterParticipant", "encounterNote",
    # MedicationRequest
    "medRequestId", "medRequestMedicationDisplay", "medRequestAuthoredOn",
    "medRequestIntent", "medRequestStatus", "medRequestPriority",
    "medRequestDosageInstruction", "medRequestDispenseRequest", "medRequestNote",
    # Procedure
    "procedureId", "procedureCodeText", "procedureStatus", "procedurePerformedDateTime",
    "procedureFollowUp", "procedureNote",
    # AllergyIntolerance
    "allergyId", "allergyClinicalStatus", "allergyVerificationStatus", "allergyType",
    "allergyCategory", "allergyCriticality", "allergyCodeText", "allergyOnsetDateTime",
    "allergyNote",
    # Practitioner
    "practitionerId", "practitionerName", "practitionerGender", "practitionerSpecialty",
    "practitionerAddress", "practitionerTelecom",
    # Organization
    "organizationId", "organizationName", "organizationType", "organizationAddress",
    "organizationTelecom",
)

# Full-text fields with BM25 boosts (reference text_fields, "name^boost" strings).
TEXT_FIELD_BOOSTS: dict[str, float] = {
    "unstructuredText": 3.0,
    "patientName": 3.0,
    "patientAddress": 3.0,
    "patientTelecom": 3.0,
    "conditionCodeText": 2.0,
    "conditionNote": 2.0,
    "observationCodeText": 1.0,
    "observationValue": 1.0,
    "observationReferenceRange": 1.0,
    "observationNote": 2.0,
    "encounterType": 1.0,
    "encounterReasonCode": 1.0,
    "encounterLocation": 1.0,
    "encounterNote": 1.0,
    "medRequestMedicationDisplay": 1.0,
    "medRequestNote": 1.0,
    "procedureCodeText": 1.0,
    "procedureNote": 1.0,
    "allergyCodeText": 1.0,
    "allergyNote": 2.0,
    "practitionerName": 3.0,
    "practitionerAddress": 1.0,
    "practitionerTelecom": 1.0,
    "organizationName": 3.0,
    "organizationAddress": 1.0,
    "organizationTelecom": 1.0,
}
TEXT_FIELDS: tuple[str, ...] = tuple(TEXT_FIELD_BOOSTS)

# Exact-match keyword fields with boosts (reference keyword_fields).
KEYWORD_FIELD_BOOSTS: dict[str, float] = {
    "patientGender": 3.0,
    "patientMaritalStatus": 2.0,
    "patientLanguage": 3.0,
    "conditionCategory": 2.0,
    "conditionClinicalStatus": 1.0,
    "conditionVerificationStatus": 1.0,
    "conditionSeverity": 1.0,
    "observationUnit": 1.0,
    "observationInterpretation": 1.0,
    "encounterStatus": 1.0,
    "encounterClass": 1.0,
    "encounterServiceProvider": 1.0,
    "medRequestIntent": 1.0,
    "medRequestStatus": 1.0,
    "medRequestPriority": 1.0,
    "procedureStatus": 1.0,
    "allergyClinicalStatus": 1.0,
    "allergyVerificationStatus": 1.0,
    "allergyType": 1.0,
    "allergyCategory": 1.0,
    "allergyCriticality": 1.0,
    "practitionerGender": 1.0,
    "practitionerSpecialty": 1.0,
    "organizationType": 1.0,
}
KEYWORD_FIELDS: tuple[str, ...] = tuple(KEYWORD_FIELD_BOOSTS)

DATE_FIELDS: tuple[str, ...] = (
    "patientDOB",
    "conditionOnsetDateTime",
    "conditionRecordedDate",
    "observationEffectiveDateTime",
    "observationIssued",
    "encounterStart",
    "encounterEnd",
    "medRequestAuthoredOn",
    "procedurePerformedDateTime",
    "allergyOnsetDateTime",
)

# NER entity label → filterable field(s) (reference ENTITY_FIELD_MAP, main.py:192-219).
ENTITY_FIELD_MAP: dict[str, object] = {
    "PERSON": "patientName",
    "DOCTOR": "practitionerName",
    "CONDITION": "conditionCodeText",
    "MEDICATION": "medRequestMedicationDisplay",
    "PROCEDURE": "procedureCodeText",
    "LABTEST": "observationCodeText",
    "ANATOMY": "observationCodeText",
    "OBS_VALUE": "observationValue",
    "ICD10_CODE": "conditionCodeText",
    "CPT_CODE": "procedureCodeText",
    "LOINC_CODE": "observationCodeText",
    "DATE": list(
        (
            "conditionOnsetDateTime",
            "observationIssued",
            "encounterStart",
            "medRequestAuthoredOn",
            "procedurePerformedDateTime",
            "allergyOnsetDateTime",
        )
    ),
    "GENDER": "patientGender",
    "PHONE": "patientTelecom",
    "EMAIL": "patientTelecom",
    "ADDRESS": "patientAddress",
    "ORGANIZATION": "organizationName",
    "SEVERITY": "conditionSeverity",
    "ALLERGY": "allergyCodeText",
}

ENTITY_LABELS: tuple[str, ...] = tuple(ENTITY_FIELD_MAP)


# --- date parsing for the epoch-day filter columns --------------------------------

_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})")

# Sentinel for "no date" in int32 epoch-day columns.
NO_DATE = -(2**31) + 1


def date_to_epoch_days(value: str | None) -> int:
    """Parse a FHIR dateTime (or date) string prefix into days since 1970-01-01."""
    if not value:
        return NO_DATE
    m = _DATE_RE.match(str(value).strip())
    if not m:
        return NO_DATE
    try:
        d = _dt.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    except ValueError:
        return NO_DATE
    return (d - _dt.date(1970, 1, 1)).days


@dataclass(frozen=True)
class DocTypes:
    STRUCTURED: int = 0
    UNSTRUCTURED: int = 1


DOC_TYPE = DocTypes()
DOC_TYPE_NAMES = {0: "structured", 1: "unstructured"}

RESOURCE_TYPE_IDS: dict[str, int] = {rt: i + 1 for i, rt in enumerate(FHIR_RESOURCE_TYPES)}
RESOURCE_TYPE_IDS["Generic"] = 0  # plain text / markdown docs
