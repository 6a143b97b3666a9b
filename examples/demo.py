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
    cfg = EngineConfig.from_env().replace(
        embed_dim=64, embed_batch_size=8, index_capacity=1024,
        database_path=":memory:", llm_backend="echo")
    engine = RassEngine(cfg, bert_cfg=BertConfig.tiny())
    n = engine.ingest_directory("demo", "sample_dataset")
    print(f"ingested {n} documents from sample_dataset/\n")
    service = AskService(engine, db=ChatStore(":memory:"))
    for q in QUESTIONS:
        answer = await service.ask(q, "demo", "demo-chat")
        print(f"Q: {q}\nA: {answer[:300]}\n")


if __name__ == "__main__":
    asyncio.run(main())
