"""Medical NER over the 19-entity taxonomy + entity→filter lowering.

Reference NER stack (app/main.py:2418-2610): a BioBERT token classifier with
BIO decoding at 0.80 confidence (``_bio_ner``) and an LLM-based JSON extractor
(``_bluehive_ner``). Here:

- ``ModelNER``: fine-tuned Flax token classifier (train/ner_train.py), BIO
  decode with the same 0.80 threshold,
- ``RuleNER``: deterministic pattern + gazetteer extractor that needs no
  weights and covers the code-shaped entities (ICD10/CPT/LOINC), dates,
  contacts, demographics, and a medical gazetteer,
- ``entities_to_filter``: the ENTITY_FIELD_MAP lowering the reference defines
  but never correctly wires (its active path passes a raw entity *list* as an
  OpenSearch filter clause, main.py:2770 — a latent type bug). Keyword-field
  entities become FilterSpec terms, DATE entities become date ranges over the
  mapped date fields, and text-field entities become must-match text terms.
"""

from __future__ import annotations

import datetime as _dt
import logging
import re

import numpy as np

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.core.schema import (
    DATE_FIELDS,
    ENTITY_FIELD_MAP,
    ENTITY_LABELS,
    KEYWORD_FIELDS,
    date_to_epoch_days,
)
from rassengine_tpu.index.store import FilterSpec

log = logging.getLogger("rassengine.ner")

Entity = dict  # {"text": str, "label": str, "confidence": float}

# BIO label scheme: O + B-X/I-X per entity type (reference train_ner.py:35-77)
BIO_LABELS: tuple[str, ...] = ("O",) + tuple(
    f"{p}-{lbl}" for lbl in ENTITY_LABELS for p in ("B", "I")
)
NUM_BIO_LABELS = len(BIO_LABELS)  # 39

_GAZETTEER: dict[str, tuple[str, ...]] = {
    "CONDITION": (
        "hypertension", "diabetes", "asthma", "copd", "pneumonia", "influenza",
        "depression", "anxiety", "obesity", "anemia", "arthritis", "osteoporosis",
        "hyperlipidemia", "stroke", "cancer", "covid", "bronchitis", "sinusitis",
        "prediabetes", "dementia", "alzheimer", "epilepsy", "migraine", "sepsis",
        "heart failure", "coronary heart disease", "atrial fibrillation",
        "chronic kidney disease", "diabetes mellitus", "otitis media",
    ),
    "MEDICATION": (
        "metformin", "lisinopril", "insulin", "aspirin", "ibuprofen",
        "amoxicillin", "atorvastatin", "albuterol", "hydrochlorothiazide",
        "amlodipine", "omeprazole", "levothyroxine", "prednisone", "warfarin",
        "clopidogrel", "simvastatin", "losartan", "gabapentin", "sertraline",
        "acetaminophen", "penicillin", "metoprolol", "furosemide",
    ),
    "PROCEDURE": (
        "appendectomy", "colonoscopy", "biopsy", "bypass", "angioplasty",
        "dialysis", "chemotherapy", "radiation therapy", "vaccination",
        "intubation", "catheterization", "transplant", "suture", "amputation",
        "endoscopy", "mammography", "echocardiogram",
    ),
    "LABTEST": (
        "hemoglobin", "a1c", "hba1c", "glucose", "cholesterol", "triglycerides",
        "creatinine", "potassium", "sodium", "tsh", "wbc", "platelet",
        "blood pressure", "heart rate", "bmi", "ldl", "hdl", "urinalysis",
    ),
    "ALLERGY": (
        "penicillin allergy", "peanut", "latex", "shellfish", "pollen",
        "sulfa", "bee venom", "egg", "dust mite",
    ),
    "SEVERITY": ("mild", "moderate", "severe", "critical"),
    "ANATOMY": (
        "heart", "lung", "liver", "kidney", "brain", "chest", "abdomen",
        "arm", "leg", "knee", "shoulder", "spine", "thyroid", "pancreas",
    ),
}

_PATTERNS: list[tuple[str, re.Pattern]] = [
    ("ICD10_CODE", re.compile(r"\b[A-TV-Z]\d{2}(?:\.\d{1,4})?\b")),
    ("LOINC_CODE", re.compile(r"\b\d{3,5}-\d\b")),
    # bare 5-digit numbers are ambiguous (zip codes, "10000 steps") — only
    # treat as CPT when the query signals a billing/procedure code context,
    # since CPT entities become AND-ed keyword filters (entities_to_filter)
    ("CPT_CODE", re.compile(r"\b\d{5}\b")),
    ("EMAIL", re.compile(r"\b[\w.+-]+@[\w-]+\.[\w.]+\b")),
    ("PHONE", re.compile(r"\b(?:\+?1[-. ]?)?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]?\d{4}\b")),
    ("DATE", re.compile(
        r"\b(\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{2,4}|"
        r"(?:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)[a-z]* \d{1,2},? \d{4}|"
        r"last (?:year|month|week)|past (?:year|month|week)|\d{4})\b", re.I)),
    ("GENDER", re.compile(r"\b(male|female|man|woman|men|women)\b", re.I)),
    ("OBS_VALUE", re.compile(r"\b\d+(?:\.\d+)?\s?(?:mg/dl|mmhg|bpm|kg|lbs|%|mmol/l)\b", re.I)),
]

# CPT cue words that disambiguate a 5-digit number from a zip code
_CPT_CONTEXT_RE = re.compile(r"\b(?:cpt|billing|billed|procedure|code)\b", re.I)

# "Dr. Smith" / "doctor Jane Doe"
_DOCTOR_RE = re.compile(r"\b(?:[Dd]r\.?|[Dd]octor)\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)?)")
# capitalized full names mid-sentence, e.g. "for Jane Doe's records"
_PERSON_RE = re.compile(r"\b([A-Z][a-z]+\s+[A-Z][a-z]+)\b")
_SENTENCE_STARTERS = frozenset(
    "What When Where Which Whose How Why Did Does Is Are Was Were Show Fetch "
    "Get List Give Find Tell Compare Explain Please Retrieve".split()
)


class RuleNER:
    def extract(self, query: str) -> list[Entity]:
        q = query or ""
        ents: list[Entity] = []
        spans: list[tuple[int, int]] = []

        def add(text, label, conf, start=None, end=None):
            if start is not None:
                for s, e in spans:
                    if start < e and s < (end or start):
                        return
                spans.append((start, end or start + len(text)))
            ents.append({"text": text, "label": label, "confidence": conf})

        for m in _DOCTOR_RE.finditer(q):
            add(m.group(1), "DOCTOR", 0.95, m.start(1), m.end(1))
        cpt_context = _CPT_CONTEXT_RE.search(q) is not None
        for label, pat in _PATTERNS:
            if label == "CPT_CODE" and not cpt_context:
                continue
            for m in pat.finditer(q):
                add(m.group(0), label, 0.9, m.start(), m.end())
        lower = q.lower()
        for label, words in _GAZETTEER.items():
            for w in words:
                # walk EVERY occurrence: the first may be an unbounded
                # substring ("diabetes" inside "prediabetes") while a
                # word-bounded one follows later in the query
                i = lower.find(w)
                while i >= 0:
                    if _word_bounded(lower, i, len(w)):
                        add(q[i : i + len(w)], label, 0.85, i, i + len(w))
                        break
                    i = lower.find(w, i + 1)
        for m in _PERSON_RE.finditer(q):
            first = m.group(1).split()[0]
            if first in _SENTENCE_STARTERS:
                continue
            add(m.group(1), "PERSON", 0.8, m.start(1), m.end(1))
        return ents


def _word_bounded(text: str, i: int, n: int) -> bool:
    before_ok = i == 0 or not text[i - 1].isalnum()
    after_ok = i + n >= len(text) or not text[i + n].isalnum()
    return before_ok and after_ok


class ModelNER:
    """Fine-tuned Flax token classifier with BIO decoding (threshold 0.80)."""

    def __init__(self, path: str, threshold: float = 0.80):
        import os

        if not os.path.exists(os.path.join(path, "params.msgpack")):
            raise FileNotFoundError(path)  # before any jax work (compile cost)
        import jax

        from rassengine_tpu.models.bert import BertConfig, BertForTokenClassification
        from rassengine_tpu.models.tokenizer import load_tokenizer
        from rassengine_tpu.models.weights import load_params
        from rassengine_tpu.train.serialization import load_model_meta

        meta = load_model_meta(path)
        cfg = (BertConfig(**{**meta["bert_config"], "remat": False})
               if meta else BertConfig.tiny())  # remat is training-only
        self.model = BertForTokenClassification(cfg, num_labels=NUM_BIO_LABELS)
        # trained length (train/ner_train.py MAX_LEN) — see intent.py note
        self.max_len = int((meta or {}).get("max_seq_len", 64))
        self.tokenizer = load_tokenizer(path, cfg.vocab_size, self.max_len)
        dummy = np.zeros((1, 8), np.int32)
        template = self.model.init(jax.random.PRNGKey(0), dummy, np.ones_like(dummy))
        params = load_params(path, template)
        if params is None:
            raise FileNotFoundError(path)
        # commit once: host-numpy params re-upload per jitted forward
        # (models/embedder.py measured the cost on tunneled chips)
        self.params = jax.device_put(params)
        self.threshold = threshold
        self._fwd = jax.jit(self.model.apply)

    def extract(self, query: str) -> list[Entity]:
        import jax.nn

        words = query.split()
        if not words:
            return []
        # tokenizer.encode_words is the exact training-time scheme
        # (train/ner_train.py encode_ner): word-aligned for both the hash and
        # WordPiece tokenizers; each word's label reads from its FIRST subtoken
        ids, mask, word_ids = self.tokenizer.encode_words(words, self.max_len)
        logits = self._fwd(self.params, ids, mask)
        probs = np.asarray(jax.nn.softmax(logits[0]))  # [L, num_labels]
        return self._decode(words, probs, word_ids[0])

    def extract_batch(self, queries: list[str]) -> list[list[Entity]]:
        """All queries in ONE forward (engine.retrieve_batch): per-query
        forwards each pay a device round-trip (~30 ms on a tunneled chip);
        the batch pays one. Batch dim pads to the next power of two so the
        jit cache stays bounded."""
        import jax.nn

        words_list = [q.split() for q in queries]
        out: list[list[Entity]] = [[] for _ in queries]
        idxs = [i for i, w in enumerate(words_list) if w]
        if not idxs:
            return out
        encs = [self.tokenizer.encode_words(words_list[i], self.max_len)
                for i in idxs]
        length = max(e[0].shape[1] for e in encs)
        nb = 1 << (len(idxs) - 1).bit_length()
        ids = np.zeros((nb, length), np.int32)
        mask = np.zeros((nb, length), np.int32)
        wids = np.full((nb, length), -1, np.int32)
        for j, (eid, em, ew) in enumerate(encs):
            ids[j, : eid.shape[1]] = eid[0]
            mask[j, : em.shape[1]] = em[0]
            wids[j, : ew.shape[1]] = ew[0]
        logits = self._fwd(self.params, ids, mask)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        for j, i in enumerate(idxs):
            out[i] = self._decode(words_list[i], probs[j], wids[j])
        return out

    def _decode(self, words: list[str], probs: np.ndarray,
                word_ids) -> list[Entity]:
        """BIO-decode one query's [L, num_labels] probs (threshold 0.80)."""
        first_pos: dict[int, int] = {}
        for j, wi in enumerate(np.asarray(word_ids).tolist()):
            if wi >= 0 and wi not in first_pos:
                first_pos[wi] = j
        ents: list[Entity] = []
        cur_words: list[str] = []
        cur_label = None
        cur_conf = 1.0

        def flush():
            nonlocal cur_words, cur_label, cur_conf
            if cur_words and cur_label:
                ents.append({"text": " ".join(cur_words), "label": cur_label,
                             "confidence": float(cur_conf)})
            cur_words, cur_label, cur_conf = [], None, 1.0

        for wi in range(len(words)):
            pos = first_pos.get(wi)
            if pos is None:
                break  # truncated by max_len
            li = int(np.argmax(probs[pos]))
            conf = float(probs[pos, li])
            label = BIO_LABELS[li]
            if label == "O" or conf < self.threshold:
                flush()
                continue
            prefix, etype = label.split("-", 1)
            if prefix == "B" or etype != cur_label:
                flush()
                cur_label = etype
                cur_conf = conf
                cur_words = [words[wi]]
            else:
                cur_words.append(words[wi])
                cur_conf = min(cur_conf, conf)
        flush()
        return ents


class NerPipeline:
    """Model-first, rule-fallback extraction (reference ner_preprocess shape)."""

    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()
        self.rules = RuleNER()
        self.model: ModelNER | None = None
        try:
            self.model = ModelNER(self.config.ner_model_path,
                                  self.config.entity_threshold)
            log.info("NER model loaded from %s", self.config.ner_model_path)
        except Exception:
            log.info("no trained NER model; using rule NER")

    def extract(self, query: str) -> list[Entity]:
        ents = self.model.extract(query) if self.model is not None else []
        return self._merge_rules(query, ents)

    def extract_batch(self, queries: list[str]) -> list[list[Entity]]:
        """One model forward for the whole batch (engine.retrieve_batch)."""
        if self.model is not None:
            model_ents = self.model.extract_batch(queries)
        else:
            model_ents = [[] for _ in queries]
        return [self._merge_rules(q, e) for q, e in zip(queries, model_ents)]

    def _merge_rules(self, query: str, ents: list[Entity]) -> list[Entity]:
        rule_ents = self.rules.extract(query)
        seen = {e["text"].lower() for e in ents}
        ents.extend(e for e in rule_ents if e["text"].lower() not in seen)
        return ents


def ner_preprocess(query: str, pipeline: NerPipeline | None = None) -> list[Entity]:
    """Reference-parity helper (main.py:2531-2543): query → entity list."""
    return (pipeline or NerPipeline()).extract(query)


# --- LLM-based NER (reference _bluehive_ner, main.py:2483-2528) ---------------

LLM_NER_SYSTEM = (
    "You are a medical NER extractor. Return ONLY a JSON array, no prose. "
    "Each element: {\"text\": <surface string>, \"label\": <one of "
    + ", ".join(ENTITY_LABELS)
    + ">}. Extract every clinical entity from the user query."
)


def llm_ner_prompt(query: str) -> str:
    return f"Extract entities from this query:\n{query}"


def parse_llm_entities(raw: str | None) -> list[Entity]:
    """Strict-JSON parse with the reference's repair ladder: markdown-fence
    stripping, then bracket slicing (main.py:2505-2528). Tolerates a None
    response (the reference crashes on it — SURVEY §2 known defects)."""
    import json

    if not raw:
        return []
    text = raw.strip()
    if text.startswith("```"):
        text = text.strip("`")
        if text.lower().startswith("json"):
            text = text[4:]
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        lo, hi = text.find("["), text.rfind("]")
        if lo < 0 or hi <= lo:
            return []
        try:
            data = json.loads(text[lo : hi + 1])
        except json.JSONDecodeError:
            return []
    out: list[Entity] = []
    if not isinstance(data, list):
        return out
    for item in data:
        if not isinstance(item, dict):
            continue
        txt = str(item.get("text") or "").strip()
        lbl = str(item.get("label") or "").strip().upper()
        if txt and lbl in ENTITY_FIELD_MAP:
            out.append({"text": txt, "label": lbl, "confidence": 0.9})
    return out


async def llm_ner_extract(query: str, llm) -> list[Entity]:
    """Async LLM NER (opt-in via EngineConfig.use_llm_ner; the reference's
    active path always uses it, main.py:2531-2543)."""
    raw = await llm.generate(llm_ner_prompt(query), LLM_NER_SYSTEM)
    return parse_llm_entities(raw)


def _parse_date_range(text: str) -> tuple[int | None, int | None] | None:
    t = text.strip().lower()
    today = _dt.date.today()
    epoch = _dt.date(1970, 1, 1)
    days = lambda d: (d - epoch).days  # noqa: E731
    m = re.fullmatch(r"(last|past) (year|month|week)", t)
    if m:
        delta = {"year": 365, "month": 30, "week": 7}[m.group(2)]
        return days(today) - delta, days(today)
    if re.fullmatch(r"\d{4}", t):
        y = int(t)
        if 1900 <= y <= 2100:
            return days(_dt.date(y, 1, 1)), days(_dt.date(y, 12, 31))
        return None
    d = date_to_epoch_days(t)
    if d != date_to_epoch_days(None):
        return d, d
    m = re.fullmatch(r"(\d{1,2})/(\d{1,2})/(\d{2,4})", t)
    if m:
        mm, dd, yy = int(m.group(1)), int(m.group(2)), int(m.group(3))
        yy = yy + 2000 if yy < 100 else yy
        try:
            d0 = days(_dt.date(yy, mm, dd))
            return d0, d0
        except ValueError:
            return None
    return None


_GENDER_NORMALIZE = {"man": "male", "men": "male", "woman": "female", "women": "female"}

_KEYWORD_FIELD_SET = set(KEYWORD_FIELDS)


def entities_to_filter(entities: list[Entity]) -> tuple[FilterSpec, dict[str, list[str]]]:
    """Lower entities to (FilterSpec, text_must_match) via ENTITY_FIELD_MAP.

    Returns the device-filterable spec plus a {text_field: [terms]} map for
    fields whose values are analyzed text (applied as lexical must-terms by the
    orchestrator).
    """
    keyword_terms: dict[str, list[str]] = {}
    date_ranges: dict[str, tuple[int | None, int | None]] = {}
    text_match: dict[str, list[str]] = {}
    for e in entities:
        label, text = e.get("label"), str(e.get("text") or "").strip()
        if not text or label not in ENTITY_FIELD_MAP:
            continue
        target = ENTITY_FIELD_MAP[label]
        if label == "DATE":
            rng = _parse_date_range(text)
            if rng:
                for f in target:
                    if f in DATE_FIELDS:
                        # several DATE entities ("from 2019 and 2021") widen
                        # to their union — last-writer-wins silently dropped
                        # all but one requested period (FilterSpec holds one
                        # range per field)
                        old = date_ranges.get(f)
                        if old is not None:
                            lo = (None if old[0] is None or rng[0] is None
                                  else min(old[0], rng[0]))
                            hi = (None if old[1] is None or rng[1] is None
                                  else max(old[1], rng[1]))
                            date_ranges[f] = (lo, hi)
                        else:
                            date_ranges[f] = rng
            continue
        if label == "GENDER":
            text = _GENDER_NORMALIZE.get(text.lower(), text.lower())
        fields = target if isinstance(target, list) else [target]
        for f in fields:
            if f in _KEYWORD_FIELD_SET:
                keyword_terms.setdefault(f, []).append(text)
            else:
                text_match.setdefault(f, []).append(text)
    return FilterSpec(keyword_terms=keyword_terms, date_ranges=date_ranges), text_match
