"""Multi-chip tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rassengine_tpu.parallel.sharding import encoder_param_spec, param_shardings
from rassengine_tpu.parallel.topk_merge import ShardRouter, sharded_topk

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def make_mesh():
    return Mesh(np.array(jax.devices()[:8]), axis_names=("shard",))


class TestShardedTopk:
    def test_matches_single_device_exact(self, rng):
        mesh = make_mesh()
        cap, d, b, k = 1024, 64, 4, 10
        vecs = rng.normal(size=(cap, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        q = rng.normal(size=(b, d)).astype(np.float32)
        mask = np.zeros(cap, np.float32)

        import jax.numpy as jnp

        row = NamedSharding(mesh, P("shard"))
        rep = NamedSharding(mesh, P())
        s, r = sharded_topk(mesh, jax.device_put(jnp.asarray(vecs), row),
                            jax.device_put(jnp.asarray(mask), row),
                            jax.device_put(jnp.asarray(q), rep), k)
        s, r = np.asarray(s), np.asarray(r)
        # oracle
        qs = q / np.linalg.norm(q, axis=1, keepdims=True)
        oracle = np.argsort(-(qs @ vecs.T), axis=1)[:, :k]
        hits = sum(len(set(r[i]) & set(oracle[i])) for i in range(b))
        assert hits / (b * k) >= 0.98

    def test_global_row_ids(self, rng):
        mesh = make_mesh()
        cap, d, k = 512, 32, 1
        vecs = rng.normal(size=(cap, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        # query exactly equal to a row owned by the LAST shard
        target = cap - 7
        q = vecs[target : target + 1]
        import jax.numpy as jnp

        row = NamedSharding(mesh, P("shard"))
        rep = NamedSharding(mesh, P())
        _s, r = sharded_topk(mesh, jax.device_put(jnp.asarray(vecs), row),
                             jax.device_put(jnp.zeros(cap, jnp.float32), row),
                             jax.device_put(jnp.asarray(q), rep), k)
        assert int(np.asarray(r)[0, 0]) == target


class TestShardRouter:
    def test_routing_is_stable_and_masks(self):
        import jax.numpy as jnp

        router = ShardRouter(8)
        s = router.shard_of("patient-123")
        assert s == router.shard_of("patient-123")
        mask = router.routed_mask(jnp.zeros(64), "patient-123", 64)
        rows_per = 64 // 8
        live = np.nonzero(np.asarray(mask) > -1e29)[0]
        assert live.tolist() == list(range(s * rows_per, (s + 1) * rows_per))


class TestParamSpecs:
    def test_megatron_layout(self):
        assert encoder_param_spec(("encoder", "layer_0", "attention", "query", "kernel")) == P(None, "tp", None)
        assert encoder_param_spec(("encoder", "layer_0", "attention", "out", "kernel")) == P("tp", None, None)
        assert encoder_param_spec(("encoder", "layer_1", "mlp_in", "kernel")) == P(None, "tp")
        assert encoder_param_spec(("encoder", "layer_1", "mlp_out", "kernel")) == P("tp", None)
        assert encoder_param_spec(("encoder", "token_embed", "embedding")) == P()

    def test_shardings_cover_tree(self):
        from rassengine_tpu.models.bert import BertConfig, BertEncoder
        import jax.numpy as jnp

        mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
        cfg = BertConfig.tiny()
        model = BertEncoder(cfg)
        ids = jnp.ones((2, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))
        shardings = param_shardings(params, mesh)
        placed = jax.device_put(params, shardings)
        hidden = model.apply(placed, ids, jnp.ones_like(ids))
        assert hidden.shape == (2, 8, cfg.hidden_size)


class TestDataParallelEmbedder:
    def test_dp_embedding_matches_single_device(self):
        from jax.sharding import Mesh

        from rassengine_tpu.core.config import EngineConfig
        from rassengine_tpu.models.bert import BertConfig
        from rassengine_tpu.models.embedder import Embedder

        cfg = EngineConfig(embed_dim=64, embed_batch_size=8)
        bert = BertConfig.tiny()
        single = Embedder(cfg, bert_cfg=bert, seed=3)
        mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("dp",))
        sharded = Embedder(cfg, bert_cfg=bert, mesh=mesh, seed=3)
        texts = [f"patient note number {i} with hypertension" for i in range(8)]
        e1 = single.embed_texts_in_batches(texts)
        e2 = sharded.embed_texts_in_batches(texts)
        np.testing.assert_allclose(e1, e2, atol=2e-2)
