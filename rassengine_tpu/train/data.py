"""Synthetic training data for the intent classifier and NER model.

Reference generators: train_intent.py:33-116 (Synthea-style names + per-intent
templates, 2k samples) and train_ner.py:81-851 (entity pools from FHIR bundles
+ 400 templates with slot-label alignment, 10k samples). Same structure here:
slot-filled templates per intent / per entity type, with BIO labels aligned at
the word level (the hash tokenizer maps one word to one token, so char-span
alignment machinery is unnecessary).
"""

from __future__ import annotations

import random

from rassengine_tpu.core.schema import ALL_INTENTS
from rassengine_tpu.nlu.ner import BIO_LABELS

FIRST_NAMES = [
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
    "Linda", "David", "Elizabeth", "William", "Barbara", "Richard", "Susan",
    "Joseph", "Jessica", "Thomas", "Sarah", "Carlos", "Maria", "Wei", "Aisha",
    "Omar", "Fatima", "Yuki", "Priya", "Lars", "Ingrid", "Dmitri", "Elena",
]
LAST_NAMES = [
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark", "Chen",
]
CONDITIONS = [
    "hypertension", "type 2 diabetes mellitus", "asthma", "chronic sinusitis",
    "acute bronchitis", "viral pharyngitis", "otitis media", "prediabetes",
    "anemia", "obesity", "coronary heart disease", "atrial fibrillation",
    "osteoarthritis", "seasonal allergic rhinitis", "major depressive disorder",
    "chronic kidney disease", "heart failure", "pneumonia", "covid-19",
]
MEDICATIONS = [
    "metformin", "lisinopril", "amoxicillin", "albuterol", "atorvastatin",
    "hydrochlorothiazide", "insulin glargine", "aspirin", "ibuprofen",
    "omeprazole", "levothyroxine", "prednisone", "warfarin", "losartan",
]
PROCEDURES = [
    "colonoscopy", "appendectomy", "echocardiogram", "chest x-ray",
    "mammography", "blood pressure panel", "influenza vaccination",
    "cardiac catheterization", "knee arthroscopy", "skin biopsy",
]
LABTESTS = [
    "hemoglobin a1c", "fasting glucose", "lipid panel", "creatinine",
    "potassium", "tsh", "complete blood count", "urinalysis", "ldl cholesterol",
]
ALLERGIES = ["penicillin", "peanuts", "latex", "shellfish", "sulfa drugs", "pollen"]
ORGS = ["Springfield General", "Mercy Clinic", "Lakeside Hospital", "Valley Health"]
DATES = ["2019-03-12", "2020-07-04", "2021-11-30", "2022-01-15", "last year", "2018"]
ICD10 = ["E11.9", "I10", "J45.909", "N18.3", "F32.1", "M17.11"]
CPT = ["99213", "93000", "80053", "71046", "45378"]
LOINC = ["4548-4", "2339-0", "718-7", "2160-0"]
GENDERS = ["male", "female"]
SEVERITIES = ["mild", "moderate", "severe"]
OBS_VALUES = ["140 mmHg", "8.2 %", "95 mg/dL", "72 bpm"]

_SLOT_POOLS = {
    "PERSON": lambda rng: f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}",
    "DOCTOR": lambda rng: f"Dr. {rng.choice(LAST_NAMES)}",
    "CONDITION": lambda rng: rng.choice(CONDITIONS),
    "MEDICATION": lambda rng: rng.choice(MEDICATIONS),
    "PROCEDURE": lambda rng: rng.choice(PROCEDURES),
    "LABTEST": lambda rng: rng.choice(LABTESTS),
    "ALLERGY": lambda rng: rng.choice(ALLERGIES),
    "ORGANIZATION": lambda rng: rng.choice(ORGS),
    "DATE": lambda rng: rng.choice(DATES),
    "ICD10_CODE": lambda rng: rng.choice(ICD10),
    "CPT_CODE": lambda rng: rng.choice(CPT),
    "LOINC_CODE": lambda rng: rng.choice(LOINC),
    "GENDER": lambda rng: rng.choice(GENDERS),
    "SEVERITY": lambda rng: rng.choice(SEVERITIES),
    "OBS_VALUE": lambda rng: rng.choice(OBS_VALUES),
    "ANATOMY": lambda rng: rng.choice(["chest", "knee", "heart", "lungs", "abdomen"]),
    "PHONE": lambda rng: "555-123-4567",
    "EMAIL": lambda rng: "patient@example.com",
    "ADDRESS": lambda rng: "12 Oak Street",
}

INTENT_TEMPLATES: dict[str, list[str]] = {
    "SEMANTIC": [
        "tell me about {PERSON}'s overall health",
        "summarize the clinical picture for {CONDITION}",
        "what should I know about this patient's {CONDITION}",
        "describe recent findings related to {ANATOMY} issues",
        "give me background on {PERSON}",
    ],
    "KEYWORD": [
        '"{CONDITION}"',
        "find notes mentioning {MEDICATION} exactly",
        "records containing the code {ICD10_CODE}",
        "search {LABTEST} results verbatim",
        "exact phrase {PROCEDURE}",
    ],
    "HYBRID": [
        "{CONDITION} treatment options for {PERSON}",
        "notes about {MEDICATION} side effects",
        "{LABTEST} trends and interpretation",
        "information on {PROCEDURE} recovery",
        "{CONDITION} management plan",
    ],
    "STRUCTURED": [
        "what is the marital status of {PERSON}",
        "what is {PERSON}'s date of birth",
        "list the status of the {MEDICATION} prescription",
        "what is the gender recorded for {PERSON}",
        "show the dosage for {MEDICATION}",
    ],
    "HYBRID_STRUCTURED": [
        "patients with a condition of {CONDITION}",
        "female patients having {CONDITION}",
        "patients with {SEVERITY} {CONDITION} on {MEDICATION}",
        "anyone with an allergy to {ALLERGY} and {CONDITION}",
        "patients whose medication includes {MEDICATION}",
    ],
    "AGGREGATE": [
        "how many patients have {CONDITION}",
        "count of encounters for {PERSON}",
        "what is the most common condition in the registry",
        "total number of {PROCEDURE} procedures performed",
        "breakdown of patients by condition",
    ],
    "COMPARISON": [
        "compare {LABTEST} between the last two visits",
        "difference between {MEDICATION} and {MEDICATION} outcomes",
        "is {PERSON}'s blood pressure higher than last year",
        "{CONDITION} versus {CONDITION} prevalence",
        "compare results before and after {PROCEDURE}",
    ],
    "TEMPORAL": [
        "when was {PERSON}'s last visit",
        "what happened in the past year with {CONDITION}",
        "show the latest {LABTEST} results",
        "history of {MEDICATION} prescriptions since {DATE}",
        "most recent encounter for {PERSON}",
    ],
    "EXPLANATORY": [
        "why was {MEDICATION} prescribed",
        "explain the {LABTEST} result of {OBS_VALUE}",
        "what does {ICD10_CODE} mean",
        "why does {CONDITION} cause fatigue",
        "explain the note about {PROCEDURE}",
    ],
    "MULTI_INTENT": [
        "what meds is {PERSON} taking? any allergies on file?",
        "count {CONDITION} cases and also list recent encounters",
        "compare {LABTEST} trends and explain the latest value",
        "show {PERSON}'s conditions and also their medications",
        "when was the last visit? what was the {LABTEST} then?",
    ],
    "ENTITY_SPECIFIC": [
        "did {DOCTOR} see {PERSON}",
        "records from {ORGANIZATION}",
        "which patients did {DOCTOR} treat",
        "contact details for {PERSON}",
        "appointments at {ORGANIZATION} clinic",
    ],
    "DOCUMENT_FETCH": [
        "fetch the medical records for {PERSON}",
        "retrieve the full chart of {PERSON}",
        "get me the uploaded documents for {PERSON}",
        "show me the raw files for {PERSON}",
        "download the record file for {PERSON}",
    ],
}

NER_TEMPLATES: list[str] = [
    "does {PERSON} have {CONDITION}",
    "is {PERSON} still taking {MEDICATION}",
    "{DOCTOR} ordered a {LABTEST} on {DATE}",
    "schedule a {PROCEDURE} for {PERSON}",
    "allergy to {ALLERGY} noted for {PERSON}",
    "{GENDER} patient with {SEVERITY} {CONDITION}",
    "the {LABTEST} came back at {OBS_VALUE}",
    "diagnosis code {ICD10_CODE} recorded on {DATE}",
    "billing used procedure code {CPT_CODE}",
    "lab {LOINC_CODE} ordered by {DOCTOR}",
    "{PERSON} visited {ORGANIZATION} on {DATE}",
    "reach the patient at {PHONE} or {EMAIL}",
    "{PERSON} lives at {ADDRESS}",
    "{MEDICATION} prescribed for {CONDITION} since {DATE}",
    "{SEVERITY} pain in the {ANATOMY} reported by {PERSON}",
    "follow up on the {PROCEDURE} performed at {ORGANIZATION}",
    "{DOCTOR} noted {CONDITION} is {SEVERITY}",
    "compare {LABTEST} with value {OBS_VALUE} from {DATE}",
    "{PERSON} saw {DOCTOR} about {CONDITION}",
    "history of {CONDITION} and {CONDITION} for {PERSON}",
]

_BIO_INDEX = {lbl: i for i, lbl in enumerate(BIO_LABELS)}


def generate_intent_data(n: int, seed: int = 0) -> list[tuple[str, int]]:
    """→ [(query, intent_label_index)] (reference generate_intent_data shape)."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        intent = rng.choice(ALL_INTENTS)
        template = rng.choice(INTENT_TEMPLATES[intent])
        text = _fill(template, rng)
        out.append((text, ALL_INTENTS.index(intent)))
    return out


def generate_ner_data(n: int, seed: int = 0) -> list[tuple[list[str], list[int]]]:
    """→ [(words, bio_label_ids)] word-aligned BIO samples."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        template = rng.choice(NER_TEMPLATES)
        words: list[str] = []
        labels: list[int] = []
        for piece in template.split():
            slot = None
            for name in _SLOT_POOLS:
                if "{" + name + "}" in piece:
                    slot = name
                    break
            if slot is None:
                words.append(piece)
                labels.append(_BIO_INDEX["O"])
                continue
            value = _SLOT_POOLS[slot](rng)
            prefix, suffix = piece.split("{" + slot + "}")
            vwords = value.split()
            for wi, w in enumerate(vwords):
                w2 = (prefix + w if wi == 0 else w) + (suffix if wi == len(vwords) - 1 else "")
                words.append(w2)
                labels.append(_BIO_INDEX[("B-" if wi == 0 else "I-") + slot])
        out.append((words, labels))
    return out


def _fill(template: str, rng: random.Random) -> str:
    text = template
    while "{" in text:
        start = text.index("{")
        end = text.index("}", start)
        slot = text[start + 1 : end]
        text = text[:start] + _SLOT_POOLS[slot](rng) + text[end + 1 :]
    return text
