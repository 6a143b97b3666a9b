"""Exact-search parity vs a CPU NumPy oracle (BASELINE.json config 1)."""

import numpy as np
import pytest

from rassengine_tpu.core import schema
from rassengine_tpu.index.exact import exact_topk, exact_topk_direct, search
from rassengine_tpu.index.store import FilterSpec, TenantIndex

DIM = 64


def numpy_oracle(vecs, queries, k, mask=None):
    q = queries / np.maximum(np.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    v = vecs / np.maximum(np.linalg.norm(vecs, axis=-1, keepdims=True), 1e-12)
    scores = q @ v.T
    if mask is not None:
        scores = np.where(mask[None, :], scores, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return idx


def make_index(rng, n=1000, dim=DIM, block_rows=256):
    idx = TenantIndex("t", dim, capacity=n, block_rows=block_rows)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    genders = ["male", "female"]
    for i in range(n):
        doc = {
            "doc_id": f"d{i}",
            "doc_type": "unstructured",
            "resourceType": "Condition" if i % 3 == 0 else "Observation",
            "patientId": f"p{i % 7}",
            "patientGender": genders[i % 2],
            "conditionOnsetDateTime": f"20{10 + i % 10:02d}-01-15",
            "unstructuredText": f"note {i}",
        }
        idx.upsert(doc, vecs[i])
    return idx, vecs


def recall_at_k(got_rows, oracle_rows):
    hits = sum(len(set(g) & set(o)) for g, o in zip(got_rows, oracle_rows))
    return hits / oracle_rows.size


class TestExactParity:
    def test_direct_matches_oracle(self, rng):
        idx, vecs = make_index(rng, n=512)
        q = rng.normal(size=(8, DIM)).astype(np.float32)
        mask = idx.filter_mask(None)
        top_s, top_i = exact_topk_direct(idx.device_columns()["vecs"], q, mask, 5)
        oracle = numpy_oracle(vecs, q, 5)
        assert recall_at_k(np.asarray(top_i), oracle) >= 0.98  # bf16 ties allowed

    def test_blockwise_matches_direct(self, rng):
        idx, vecs = make_index(rng, n=2048, block_rows=256)
        q = rng.normal(size=(4, DIM)).astype(np.float32)
        cols = idx.device_columns()
        mask = idx.filter_mask(None)
        s1, i1 = exact_topk_direct(cols["vecs"], q, mask, 10)
        s2, i2 = exact_topk(cols["vecs"], q, mask, 10, block_rows=256)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)
        assert recall_at_k(np.asarray(i2), np.asarray(i1)) >= 0.98

    def test_padding_rows_never_returned(self, rng):
        idx, _ = make_index(rng, n=100, block_rows=256)  # capacity padded to 256
        q = rng.normal(size=(2, DIM)).astype(np.float32)
        hits = search(idx, q, k=5)
        for per_q in hits:
            assert len(per_q) == 5
            for src, _ in per_q:
                assert src is not None


class TestFilters:
    def test_patient_routing_filter(self, rng):
        idx, vecs = make_index(rng)
        q = rng.normal(size=(1, DIM)).astype(np.float32)
        hits = search(idx, q, k=10, spec=FilterSpec(patient_id="p3"))[0]
        assert hits and all(src["patientId"] == "p3" for src, _ in hits)

    def test_keyword_term_filter(self, rng):
        idx, _ = make_index(rng)
        q = rng.normal(size=(1, DIM)).astype(np.float32)
        spec = FilterSpec(keyword_terms={"patientGender": ["female"]})
        hits = search(idx, q, k=10, spec=spec)[0]
        assert hits and all(src["patientGender"] == "female" for src, _ in hits)

    def test_date_range_filter(self, rng):
        idx, _ = make_index(rng)
        q = rng.normal(size=(1, DIM)).astype(np.float32)
        lo = schema.date_to_epoch_days("2015-01-01")
        spec = FilterSpec(date_ranges={"conditionOnsetDateTime": (lo, None)})
        hits = search(idx, q, k=20, spec=spec)[0]
        assert hits
        for src, _ in hits:
            assert schema.date_to_epoch_days(src["conditionOnsetDateTime"]) >= lo

    def test_resource_type_filter(self, rng):
        idx, _ = make_index(rng)
        q = rng.normal(size=(1, DIM)).astype(np.float32)
        hits = search(idx, q, k=10, spec=FilterSpec(resource_type="Condition"))[0]
        assert hits and all(src["resourceType"] == "Condition" for src, _ in hits)

    def test_conjunction_of_filters(self, rng):
        idx, _ = make_index(rng)
        q = rng.normal(size=(1, DIM)).astype(np.float32)
        spec = FilterSpec(patient_id="p1", keyword_terms={"patientGender": ["female"]})
        hits = search(idx, q, k=50, spec=spec)[0]
        for src, _ in hits:
            assert src["patientId"] == "p1" and src["patientGender"] == "female"


class TestUpsert:
    def test_upsert_overwrites_by_doc_id(self, rng):
        idx = TenantIndex("t", DIM, capacity=256, block_rows=256)
        v = rng.normal(size=(DIM,)).astype(np.float32)
        idx.upsert({"doc_id": "a", "doc_type": "unstructured", "unstructuredText": "x"}, v)
        idx.upsert({"doc_id": "a", "doc_type": "unstructured", "unstructuredText": "y"}, v)
        assert idx.count == 1
        assert idx.docs[0]["unstructuredText"] == "y"

    def test_growth_preserves_data(self, rng):
        idx = TenantIndex("t", DIM, capacity=128, block_rows=128)
        vecs = rng.normal(size=(300, DIM)).astype(np.float32)
        for i in range(300):
            idx.upsert(
                {"doc_id": f"g{i}", "doc_type": "unstructured", "unstructuredText": str(i)},
                vecs[i],
            )
        assert idx.count == 300 and idx.capacity >= 300
        q = vecs[7:8]
        hits = search(idx, q, k=1)[0]
        assert hits[0][0]["doc_id"] == "g7"

    def test_structured_docs_excluded_from_semantic(self, rng):
        idx = TenantIndex("t", DIM, capacity=128, block_rows=128)
        idx.upsert({"doc_id": "s1", "doc_type": "structured", "resourceType": "Patient"})
        v = rng.normal(size=(DIM,)).astype(np.float32)
        idx.upsert({"doc_id": "u1", "doc_type": "unstructured"}, v)
        hits = search(idx, v[None, :], k=5, spec=FilterSpec(require_embedding=True))[0]
        assert [src["doc_id"] for src, _ in hits] == ["u1"]
