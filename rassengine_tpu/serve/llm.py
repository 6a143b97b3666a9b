"""LLM generation clients.

Reference clients: BlueHive REST (app/main.py:283-331, returns None on any
error) and OpenAI GPT-4o streaming (main.py:3021-3051, yields "[ERROR] ..."
inline on failure), both throttled by a 5-slot semaphore (main.py:280). Parity
here plus an ``echo`` backend — a deterministic offline generator that answers
from the retrieved context so the full stack runs with zero egress (tests, CI,
air-gapped benches).
"""

from __future__ import annotations

import asyncio
import logging
from typing import AsyncIterator

from rassengine_tpu.core.config import EngineConfig

log = logging.getLogger("rassengine.llm")


class LlmClient:
    """Interface: one-shot generate + streaming generate_stream."""

    async def generate(self, prompt: str, system_msg: str = "") -> str | None:
        raise NotImplementedError

    async def generate_stream(self, prompt: str, system_msg: str = "") -> AsyncIterator[str]:
        text = await self.generate(prompt, system_msg)
        if text:
            for i in range(0, len(text), 64):
                yield text[i : i + 64]


class EchoLlm(LlmClient):
    """Deterministic offline backend: answers with the cited context summary."""

    async def generate(self, prompt: str, system_msg: str = "") -> str | None:
        lines = [ln for ln in prompt.splitlines() if ln.strip()]
        cited = [ln for ln in lines if ln.lstrip().startswith("[Doc:")]
        if cited:
            return "Based on the records: " + " ".join(cited[:3])
        q = lines[-1] if lines else ""
        return f"No indexed context found. Query was: {q[:200]}"


class BlueHiveLlm(LlmClient):
    """Reference bluehive_generate_text parity (main.py:283-331)."""

    def __init__(self, config: EngineConfig):
        self.url = config.bluehive_api_url
        self.token = config.bluehive_bearer_token
        self.sem = asyncio.Semaphore(config.max_llm_concurrency)

    async def generate(self, prompt: str, system_msg: str = "") -> str | None:
        import httpx

        if not self.url:
            log.error("BlueHive URL not configured")
            return None
        headers = {"Content-Type": "application/json"}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        async with self.sem:
            try:
                async with httpx.AsyncClient(timeout=30.0) as client:
                    resp = await client.post(
                        self.url,
                        json={"prompt": prompt, "systemMessage": system_msg},
                        headers=headers,
                    )
                    resp.raise_for_status()
                    data = resp.json()
                    choices = data.get("choices", [])
                    if not choices:
                        return None
                    return choices[0].get("message", {}).get("content")
            except Exception as e:  # swallow-and-degrade like the reference
                log.error("BlueHive error: %s", e)
                return None


class OpenAiLlm(LlmClient):
    """Reference openai_generate_text_stream parity (main.py:3021-3051)."""

    def __init__(self, config: EngineConfig):
        self.api_key = config.openai_api_key
        self.sem = asyncio.Semaphore(config.max_llm_concurrency)
        self.model = "gpt-4o"

    async def generate(self, prompt: str, system_msg: str = "") -> str | None:
        """Non-streaming form: None on error (BlueHiveLlm's contract) — the
        stream yields failures as inline "[ERROR] ..." tokens (reference
        main.py:3049), which non-stream callers (llm_ner_extract) must never
        receive as content."""
        chunks = [c async for c in self.generate_stream(prompt, system_msg)]
        if any(c.startswith("[ERROR]") for c in chunks):
            return None
        text = "".join(chunks)
        return text or None

    async def generate_stream(self, prompt: str, system_msg: str = "") -> AsyncIterator[str]:
        import httpx

        async with self.sem:
            try:
                async with httpx.AsyncClient(timeout=60.0) as client:
                    async with client.stream(
                        "POST",
                        "https://api.openai.com/v1/chat/completions",
                        headers={"Authorization": f"Bearer {self.api_key}"},
                        json={
                            "model": self.model,
                            "messages": [
                                {"role": "system", "content": system_msg},
                                {"role": "user", "content": prompt},
                            ],
                            "max_tokens": 1024,
                            "temperature": 0.7,
                            "stream": True,
                        },
                    ) as resp:
                        async for line in resp.aiter_lines():
                            if not line.startswith("data:"):
                                continue
                            payload = line[5:].strip()
                            if payload == "[DONE]":
                                break
                            import json

                            try:
                                delta = json.loads(payload)["choices"][0]["delta"]
                                if "content" in delta:
                                    yield delta["content"]
                            except Exception:
                                continue
            except Exception as e:  # inline error token, reference main.py:3049
                yield f"[ERROR] {e}"


def make_llm(config: EngineConfig) -> LlmClient:
    backend = (config.llm_backend or "echo").lower()
    if backend == "bluehive":
        return BlueHiveLlm(config)
    if backend == "openai":
        return OpenAiLlm(config)
    return EchoLlm()
