"""Patient-ID resolution from names in the query.

Reference ``resolve_patient_ids_from_name`` (app/main.py:2637-2744): LLM NER
finds the first PERSON/PATIENT_ID entity, then an OpenSearch lookup on
``patientName`` (term/phrase/fuzzy should-clauses, collapse by patientId)
returns the candidate ids. Here the NER pipeline finds the entity and the
lexical entity-field group provides the name lookup, collapsed by patientId.
"""

from __future__ import annotations

import logging

from rassengine_tpu.lexical.bm25 import damerau1
from rassengine_tpu.nlu.ner import NerPipeline

log = logging.getLogger("rassengine.patient")


def _token_matches(tok: str, pname: str) -> bool:
    """Containment or edit-distance-1 token match ("fuzziness": "AUTO",
    reference main.py:2709-2731) — 'Jon Carter' must resolve 'John Carter'."""
    if tok in pname:
        return True
    if len(tok) < 3:
        return False
    return any(damerau1(tok, pt) for pt in pname.split())


def resolve_patient_ids_from_name(query: str, retriever, ner: NerPipeline,
                                  max_ids: int = 10) -> tuple[str | None, list[str]]:
    """→ (detected name or raw id, [matching patient ids])."""
    entities = ner.extract(query)
    name = None
    for e in entities:
        if e["label"] in ("PERSON", "PATIENT_ID"):
            name = e["text"]
            break
    if not name:
        return None, []
    # direct id mention, e.g. "patient 42" / an exact patientId string
    direct = name.strip()
    ids: list[str] = []
    seen: set[str] = set()
    # name lookup over the entity field group (patientName boost 4.0),
    # collapse by patientId (reference main.py:2709-2731)
    hits = retriever.entity_specific_search(name, k=max_ids * 4)
    for src, _score in hits:
        pid = src.get("patientId")
        pname = (src.get("patientName") or "").lower()
        if not pid or pid in seen:
            continue
        if pname and any(_token_matches(tok, pname) for tok in name.lower().split()):
            seen.add(pid)
            ids.append(pid)
        elif pid == direct:
            seen.add(pid)
            ids.append(pid)
    log.info("resolved name %r → patient ids %s", name, ids[:max_ids])
    return name, ids[:max_ids]
