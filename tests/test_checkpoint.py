"""Index checkpoint round-trip tests."""

import numpy as np

from rassengine_tpu.index.checkpoint import load_tenant, save_tenant
from rassengine_tpu.index.exact import search
from rassengine_tpu.index.store import FilterSpec, TenantIndex
from rassengine_tpu.lexical.bm25 import LexicalIndex


def test_round_trip_preserves_search(rng, tmp_path):
    idx = TenantIndex("rass-index-ck", 32, capacity=256, block_rows=256)
    lex = LexicalIndex()
    vecs = rng.normal(size=(50, 32)).astype(np.float32)
    for i in range(50):
        doc = {"doc_id": f"d{i}", "doc_type": "unstructured",
               "patientId": f"p{i % 5}", "patientGender": "female" if i % 2 else "male",
               "unstructuredText": f"clinical note number {i} about hypertension"}
        row = idx.upsert(doc, vecs[i])
        lex.index_doc(row, doc)
    save_tenant(idx, str(tmp_path / "ck"))
    idx2, lex2 = load_tenant(str(tmp_path / "ck"))

    assert idx2.count == 50 and idx2.name == "rass-index-ck"
    q = vecs[7:8]
    h1 = search(idx, q, k=3)[0]
    h2 = search(idx2, q, k=3)[0]
    assert [d["doc_id"] for d, _ in h1] == [d["doc_id"] for d, _ in h2]
    # filters survive
    hits = search(idx2, q, k=10, spec=FilterSpec(patient_id="p2"))[0]
    assert hits and all(d["patientId"] == "p2" for d, _ in hits)
    # lexical rebuilt
    s1 = lex.score("hypertension", idx.capacity)
    s2 = lex2.score("hypertension", idx2.capacity)
    np.testing.assert_allclose(s1[:50], s2[:50], rtol=1e-6)
    # upsert-by-id still works after load
    idx2.upsert({"doc_id": "d7", "doc_type": "unstructured",
                 "unstructuredText": "replaced"}, vecs[7])
    assert idx2.count == 50


def test_engine_save_load(rng, tmp_path):
    from rassengine_tpu.core.config import EngineConfig
    from rassengine_tpu.engine import RassEngine
    from rassengine_tpu.index.checkpoint import load_engine, save_engine
    from rassengine_tpu.models.bert import BertConfig

    cfg = EngineConfig(embed_dim=32, embed_batch_size=4, index_capacity=256,
                       intent_model_path="/none", ner_model_path="/none")
    eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    eng.ingest_docs("alice", [], [{"doc_id": "x1", "doc_type": "unstructured",
                                   "unstructuredText": "metformin dosage note"}])
    save_engine(eng, str(tmp_path / "all"))

    eng2 = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    n = load_engine(eng2, str(tmp_path / "all"))
    assert n == 1
    t = eng2.tenant("alice")
    assert t.index.count == 1
    assert t.index.docs[0]["doc_id"] == "x1"
