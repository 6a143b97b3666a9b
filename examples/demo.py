"""End-to-end demo: ingest the sample EHR corpus and ask questions.

Run from the repo root (uses the shipped tiny NLU checkpoints and the echo
generation backend — no network, no model downloads):

    python examples/demo.py
"""

import asyncio
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rassengine_tpu.core.config import EngineConfig          # noqa: E402
from rassengine_tpu.engine import RassEngine                 # noqa: E402
from rassengine_tpu.models.bert import BertConfig            # noqa: E402
from rassengine_tpu.serve.ask import AskService              # noqa: E402
from rassengine_tpu.serve.db import ChatStore                # noqa: E402

QUESTIONS = [
    "how many patients have each condition?",
    "why was the blood pressure still elevated, explain",
    "fetch the medical records for John Carter",
    '"hydrochlorothiazide"',
    "metformin GI upset",
]


async def main() -> None:
    env_cfg = EngineConfig.from_env()
    custom_weights = (env_cfg.encoder_weights_path
                      and env_cfg.encoder_weights_path
                      not in ("./encoder_model_prod", "encoder_model_prod"))
    cfg = env_cfg.replace(
        # a custom ENCODER_WEIGHTS_PATH must keep ITS embed dim — forcing
        # 64 against e.g. a 1024-d checkpoint mismatches index vs encoder
        embed_dim=env_cfg.embed_dim if custom_weights else 64,
        embed_batch_size=8, index_capacity=1024,
        database_path=":memory:", llm_backend="echo")
    bert_cfg = None if custom_weights else BertConfig.tiny()
    if os.path.isdir("encoder_model_prod") and (
            not cfg.encoder_weights_path
            or cfg.encoder_weights_path == "./encoder_model_prod"):
        # the shipped production 1024-d contrastively-trained bi-encoder:
        # semantically trusted embeddings → the semantic answer cache is on
        cfg = cfg.replace(encoder_weights_path="encoder_model_prod",
                          embed_dim=1024)
        bert_cfg = None
    elif os.path.isdir("encoder_model") and not cfg.encoder_weights_path:
        # fallback: the small 128-d checkpoint (CI-sized)
        cfg = cfg.replace(encoder_weights_path="encoder_model", embed_dim=128)
        bert_cfg = None
    engine = RassEngine(cfg, bert_cfg=bert_cfg)
    print(f"encoder trusted_semantics={engine.embedder.trusted_semantics}")
    n = engine.ingest_directory("demo", "sample_dataset")
    print(f"ingested {n} documents from sample_dataset/\n")
    service = AskService(engine, db=ChatStore(":memory:"))
    print(f"semantic cache enabled={service.cache is not None}"
          + (f" threshold={service.cache.sim_threshold:.3f}"
             f" (suggested={engine.embedder.suggested_cache_threshold})"
             if service.cache is not None else ""))
    for q in QUESTIONS:
        answer = await service.ask(q, "demo", "demo-chat")
        print(f"Q: {q}\nA: {answer[:300]}\n")
    # a paraphrased repeat should hit the semantic cache when trusted
    if service.cache is not None:
        from rassengine_tpu.core.tracing import METRICS

        before = METRICS.counters.get("cache_hits", 0)
        # near-paraphrase above the 0.88 threshold ("stomach upset" measures
        # 0.84 on the small shipped encoder — below the conservative cutoff)
        await service.ask("metformin GI upset issues", "demo", "demo-chat")
        print(f"cache hits after paraphrase: {METRICS.counters.get('cache_hits', 0)}"
              f" (was {before})")


if __name__ == "__main__":
    asyncio.run(main())
