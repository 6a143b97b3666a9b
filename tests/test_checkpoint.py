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


def _mk_sharded(rng, n_shards, n_docs=60, dim=32, cap=512):
    """A sharded tenant: rows place into per-shard regions by patient hash."""
    from rassengine_tpu.core.meshes import shard_mesh

    mesh = shard_mesh(n_shards)
    idx = TenantIndex("rass-part-ck", dim, capacity=cap, block_rows=128,
                      mesh=mesh)
    lex = LexicalIndex()
    vecs = rng.normal(size=(n_docs, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    for i in range(n_docs):
        doc = {"doc_id": f"d{i}", "doc_type": "unstructured",
               "patientId": f"p{i % 7}",
               "unstructuredText": f"note {i} about diabetes"}
        row = idx.upsert(doc, vecs[i])
        lex.index_doc(row, doc)
    return idx, lex, vecs, mesh


class TestPartitionedCheckpoint:
    """Per-host checkpoint partitioning + elastic re-sharding (ROADMAP r3 #2):
    each process saves only its shard regions; a partitioned checkpoint
    restores onto ANY shard/host count via patient-hash re-placement."""

    def test_row_range_saves_only_slice(self, rng, tmp_path):
        idx, lex, vecs, _ = _mk_sharded(rng, 4)
        rs = idx.capacity // 4
        save_tenant(idx, str(tmp_path / "p0"), row_range=(0, 2 * rs))
        save_tenant(idx, str(tmp_path / "p1"), row_range=(2 * rs, idx.capacity))
        import json
        with open(tmp_path / "p0" / "meta.json") as f:
            c0 = json.load(f)["count"]
        with open(tmp_path / "p1" / "meta.json") as f:
            c1 = json.load(f)["count"]
        assert c0 + c1 == 60 and c0 > 0 and c1 > 0

    def test_partitioned_load_reshards_elastically(self, rng, tmp_path):
        from rassengine_tpu.core.meshes import shard_mesh

        idx, lex, vecs, _ = _mk_sharded(rng, 4)
        rs = idx.capacity // 4
        root = tmp_path / "ck"
        # simulate a 2-host fleet: each saves its two shard regions
        save_tenant(idx, str(root / "part0"), row_range=(0, 2 * rs))
        save_tenant(idx, str(root / "part1"), row_range=(2 * rs, idx.capacity))
        # restore onto a DIFFERENT topology (2 shards) and unsharded
        for mesh2 in (shard_mesh(2), None):
            idx2, lex2 = load_tenant(str(root), mesh=mesh2)
            assert idx2.count == 60
            q = vecs[7:8]
            h1 = [d["doc_id"] for d, _ in search(idx, q, k=5)[0]]
            h2 = [d["doc_id"] for d, _ in search(idx2, q, k=5)[0]]
            assert h1 == h2
            hits = search(idx2, q, k=10, spec=FilterSpec(patient_id="p2"))[0]
            assert hits and all(d["patientId"] == "p2" for d, _ in hits)
            # lexical postings rebuilt against the re-placed rows
            got = lex2.score("diabetes", idx2.capacity)
            assert (got > 0).sum() == 60

    def test_engine_partitioned_save_and_union_load(self, rng, tmp_path):
        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.engine import RassEngine
        from rassengine_tpu.index.checkpoint import load_engine, save_engine
        from rassengine_tpu.models.bert import BertConfig

        cfg = EngineConfig(embed_dim=32, embed_batch_size=4,
                           index_capacity=512, index_block_rows=128,
                           shard_count=4, intent_model_path="/none",
                           ner_model_path="/none")
        eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        docs = [{"doc_id": f"x{i}", "doc_type": "unstructured",
                 "patientId": f"p{i % 5}",
                 "unstructuredText": f"note {i} metformin dosage"}
                for i in range(24)]
        eng.ingest_docs("alice", [], docs)
        # simulate each host's save_engine call
        save_engine(eng, str(tmp_path / "fleet"), partition=(0, 2))
        save_engine(eng, str(tmp_path / "fleet"), partition=(1, 2))

        cfg2 = EngineConfig(embed_dim=32, embed_batch_size=4,
                            index_capacity=512, index_block_rows=128,
                            shard_count=2, intent_model_path="/none",
                            ner_model_path="/none")
        eng2 = RassEngine(cfg2, bert_cfg=BertConfig.tiny(), use_pallas=False)
        n = load_engine(eng2, str(tmp_path / "fleet"))
        assert n == 1
        t = eng2.tenant("alice")
        assert t.index.count == 24
        a = eng.retrieve("alice", "metformin dosage", top_k=5)
        b = eng2.retrieve("alice", "metformin dosage", top_k=5)
        assert ([h["doc_id"] for h, _ in a.hits]
                == [h["doc_id"] for h, _ in b.hits])

    def test_topology_change_ignores_stale_layouts(self, rng, tmp_path):
        """Fleet→single and fleet-shrink must not resurrect stale data:
        a newer flat save wins over older part dirs, a 2-proc save drops a
        stale 4-proc-era part, and stale per-process manifests are cleaned
        by the single-process save (round-3 review finding #2)."""
        import time as _time

        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.engine import RassEngine
        from rassengine_tpu.index.checkpoint import load_engine, save_engine
        from rassengine_tpu.models.bert import BertConfig

        cfg = EngineConfig(embed_dim=32, embed_batch_size=4,
                           index_capacity=512, index_block_rows=128,
                           intent_model_path="/none", ner_model_path="/none")
        eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        docs = [{"doc_id": f"x{i}", "doc_type": "unstructured",
                 "patientId": f"p{i % 5}",
                 "unstructuredText": f"note {i} metformin dosage"}
                for i in range(24)]
        eng.ingest_docs("alice", [], docs)
        root = str(tmp_path / "fleet")
        # era 1: 4-process fleet save
        for pid in range(4):
            save_engine(eng, root, partition=(pid, 4))
        # era 2: docs deleted, then a 2-process fleet save
        eng.delete_docs("alice", ["x0", "x1"])
        _time.sleep(0.02)
        for pid in range(2):
            save_engine(eng, root, partition=(pid, 2))
        eng2 = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        assert load_engine(eng2, root) == 1
        # deleted docs must NOT resurrect from the stale part2/part3
        assert eng2.tenant("alice").index.count == 22
        assert "x0" not in eng2.tenant("alice").index._id_to_row
        # era 3: single-process save wins over all part dirs + manifests
        eng.delete_docs("alice", ["x2"])
        _time.sleep(0.02)
        save_engine(eng, root)
        import os as _os

        assert not [f for f in _os.listdir(root)
                    if f.startswith("tenants.p")]
        eng3 = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        assert load_engine(eng3, root) == 1
        assert eng3.tenant("alice").index.count == 21

    def test_stale_manifest_entry_skipped(self, rng, tmp_path):
        """A tenants.pN.json naming a since-deleted tenant dir must not
        abort the whole restore."""
        import json as _json
        import os as _os

        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.engine import RassEngine
        from rassengine_tpu.index.checkpoint import load_engine, save_engine
        from rassengine_tpu.models.bert import BertConfig

        cfg = EngineConfig(embed_dim=32, embed_batch_size=4,
                           index_capacity=256, intent_model_path="/none",
                           ner_model_path="/none")
        eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        eng.ingest_docs("alice", [], [{"doc_id": "a", "doc_type":
                                       "unstructured",
                                       "unstructuredText": "hello"}])
        root = str(tmp_path / "ck")
        save_engine(eng, root, partition=(0, 2))
        with open(_os.path.join(root, "tenants.p1.json"), "w") as f:
            _json.dump(["rass-index-ghost"], f)
        eng2 = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
        assert load_engine(eng2, root) == 1  # ghost skipped, alice loads


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
