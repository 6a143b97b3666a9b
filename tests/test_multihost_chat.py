"""Multi-host shared chat persistence: 2 real OS processes (VERDICT r3 #7).

The reference's chats live in one shared Postgres (prisma/schema.prisma), so
every API replica enforces the same ownership rows. This test runs the chat
PRIMARY (serve/app.py with its sqlite ChatStore and the /internal/chat op
endpoint) in a separate process, and a FOLLOWER AskService in this process
whose DATABASE_PATH points at the primary (serve/chatdb_remote.py). The 403
semantics must be identical to the single-host store: a chat created through
the follower is owned fleet-wide, and a foreign user is rejected on every
host.
"""

import asyncio
import json
import os
import subprocess
import sys
import urllib.error
import urllib.request

import pytest

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig
from rassengine_tpu.serve.ask import AskService, AuthorizationError
from rassengine_tpu.serve.chatdb_remote import RemoteChatStore, open_chat_store

TOKEN = "fleet-secret"

_PRIMARY = r"""
import asyncio, sys
import jax
jax.config.update("jax_platforms", "cpu")

from rassengine_tpu.core.config import EngineConfig
from rassengine_tpu.engine import RassEngine
from rassengine_tpu.models.bert import BertConfig
from rassengine_tpu.serve.app import build_app

async def main():
    cfg = EngineConfig(
        embed_dim=32, embed_batch_size=4, index_capacity=512,
        index_block_rows=512, database_path=sys.argv[1], llm_backend="echo",
        intent_model_path="/nonexistent", ner_model_path="/nonexistent",
        admin_token="fleet-secret", api_token="client-token",
    )
    eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    app = build_app(eng)
    server = await app.start("127.0.0.1", 0)
    print("READY", server.sockets[0].getsockname()[1], flush=True)
    await asyncio.Event().wait()

asyncio.run(main())
"""


@pytest.fixture(scope="module")
def primary(tmp_path_factory):
    db = str(tmp_path_factory.mktemp("chat") / "chats.db")
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    p = subprocess.Popen([sys.executable, "-c", _PRIMARY, db], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    line = p.stdout.readline()
    for _ in range(200):
        if line.startswith("READY"):
            break
        line = p.stdout.readline()
    assert line.startswith("READY"), f"primary failed to start: {line}"
    port = int(line.split()[1])
    yield f"http://127.0.0.1:{port}"
    p.terminate()
    p.wait(timeout=10)


@pytest.fixture()
def follower_service(primary):
    cfg = EngineConfig(
        embed_dim=32, embed_batch_size=4, index_capacity=512,
        index_block_rows=512, database_path=primary, llm_backend="echo",
        intent_model_path="/nonexistent", ner_model_path="/nonexistent",
        admin_token=TOKEN,
    )
    eng = RassEngine(cfg, bert_cfg=BertConfig.tiny(), use_pallas=False)
    svc = AskService(eng)  # open_chat_store resolves the URL → RemoteChatStore
    assert isinstance(svc.db, RemoteChatStore)
    return svc


def run(coro):
    return asyncio.run(coro)


class TestFleetChat:
    def test_follower_resolves_remote_store(self, primary):
        store = open_chat_store(primary, TOKEN)
        assert isinstance(store, RemoteChatStore)
        local = open_chat_store(":memory:", TOKEN)
        assert not isinstance(local, RemoteChatStore)

    def test_403_consistent_across_processes(self, follower_service):
        """Chat created via host B (follower) is owned fleet-wide: a foreign
        user is rejected with the same AuthorizationError the local store
        raises (reference main.py:2764-2767 semantics)."""
        svc = follower_service
        ans = run(svc.ask("hello there", "owner-1", "fleet-chat"))
        assert isinstance(ans, str)
        with pytest.raises(AuthorizationError):
            run(svc.ask("steal it", "intruder", "fleet-chat"))
        # a THIRD host (fresh RemoteChatStore) sees the same owner + history
        third = RemoteChatStore(svc.config.database_path, TOKEN)
        assert third.chat_owner("fleet-chat") == "owner-1"
        hist = third.history("fleet-chat")
        assert [m["role"] for m in hist] == ["user", "assistant"]
        assert hist[0]["content"] == "hello there"

    def test_endpoint_requires_token(self, primary):
        body = json.dumps({"op": "chat_owner",
                           "args": {"chat_id": "fleet-chat"}}).encode()
        req = urllib.request.Request(primary + "/internal/chat", data=body,
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 401

    def test_client_bearer_token_does_not_open_internal_chat(self, primary):
        """ADVICE r4 (medium): /internal/chat reads/writes arbitrary chats,
        so the shared client API token must NOT open it — only the fleet
        ADMIN_TOKEN does (the primary above runs with BOTH configured)."""
        body = json.dumps({"op": "chat_owner",
                           "args": {"chat_id": "fleet-chat"}}).encode()
        req = urllib.request.Request(
            primary + "/internal/chat", data=body,
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer client-token"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=5)
        assert exc.value.code == 401
        # and the fleet secret DOES open it
        req = urllib.request.Request(
            primary + "/internal/chat", data=body,
            headers={"Content-Type": "application/json",
                     "X-Admin-Token": TOKEN})
        with urllib.request.urlopen(req, timeout=5) as resp:
            assert resp.status == 200

    def test_endpoint_rejects_unknown_ops(self, primary):
        store = RemoteChatStore(primary, TOKEN)
        with pytest.raises(RuntimeError, match="400"):
            store._call("close")  # not in CHAT_OPS: no remote shutdown
        with pytest.raises(RuntimeError, match="400"):
            store._call("__init__")

    def test_history_limit_and_owner_roundtrip(self, primary):
        store = RemoteChatStore(primary, TOKEN)
        store.create_user("u-rt")
        assert store.user_exists("u-rt")
        assert not store.user_exists("u-nope")
        cid = store.create_chat("u-rt", "rt-chat")
        assert cid == "rt-chat"
        store.add_messages("rt-chat", [("user", f"m{i}") for i in range(15)])
        hist = store.history("rt-chat", limit=10)
        assert len(hist) == 10
        assert hist[-1]["content"] == "m14"  # last-N, oldest→newest
