"""Minimal asyncio HTTP/1.1 + WebSocket server.

The reference serves via FastAPI/uvicorn; neither ships in this image, so the
framework carries its own small server: request parsing, routing, JSON and
multipart/form-data bodies, streaming responses, and RFC6455 WebSocket
handshake + text frames (enough for the /ws/ask token stream). Single-process
asyncio, mirroring the reference's deployment model.
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import json
import logging
import re
import struct
from dataclasses import dataclass, field
from typing import AsyncIterator, Awaitable, Callable
from urllib.parse import parse_qs, unquote, urlsplit

log = logging.getLogger("rassengine.http")

_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
MAX_BODY = 64 * 1024 * 1024


class BodyReader:
    """Bounded incremental reader over the request body (content-length)."""

    def __init__(self, reader: asyncio.StreamReader, remaining: int):
        self._reader = reader
        self.remaining = remaining

    async def read(self, n: int = 8192) -> bytes:
        if self.remaining <= 0:
            return b""
        chunk = await self._reader.read(min(n, self.remaining))
        if not chunk:
            raise asyncio.IncompleteReadError(b"", self.remaining)
        self.remaining -= len(chunk)
        return chunk


class MemoryBodyReader:
    """BodyReader over an in-memory body (buffered requests, tests)."""

    def __init__(self, body: bytes):
        self._body = body
        self._pos = 0

    async def read(self, n: int = 8192) -> bytes:
        out = self._body[self._pos: self._pos + n]
        self._pos += len(out)
        return out


class MultipartStream:
    """Incremental multipart/form-data parser.

    The reference reads uploads in 8 KB chunks with an incremental size check
    (embedding_gen.py:1239-1250); buffering the whole body first would defeat
    the per-file limit. ``parts()`` yields (headers, chunk-async-iterator) per
    part; a part's chunks must be consumed before advancing (parts() drains
    any remainder itself).
    """

    def __init__(self, body, boundary: bytes, chunk_size: int = 8192):
        self._body = body
        self._delim = b"\r\n--" + boundary
        self._first = b"--" + boundary
        self._chunk = chunk_size
        self._buf = b""
        self._eof = False
        self._part_done = True

    async def _fill(self) -> bool:
        if self._eof:
            return False
        c = await self._body.read(self._chunk)
        if not c:
            self._eof = True
            return False
        self._buf += c
        return True

    async def parts(self):
        while self._first not in self._buf:  # preamble → first boundary
            if not await self._fill():
                return
        self._buf = self._buf[self._buf.find(self._first) + len(self._first):]
        while True:
            while len(self._buf) < 2 and not self._eof:
                await self._fill()
            if self._buf[:2] == b"--":  # closing boundary
                return
            if self._buf[:2] == b"\r\n":
                self._buf = self._buf[2:]
            while b"\r\n\r\n" not in self._buf:
                if not await self._fill():
                    return
            j = self._buf.find(b"\r\n\r\n")
            head = self._buf[:j].decode("utf-8", "replace")
            self._buf = self._buf[j + 4:]
            headers: dict[str, str] = {}
            for line in head.split("\r\n"):
                k, _, v = line.partition(":")
                if k.strip():
                    headers[k.strip().lower()] = v.strip()
            self._part_done = False
            chunks = self._part_chunks()
            yield headers, chunks
            while not self._part_done:  # drain if the caller stopped early
                async for _ in chunks:
                    pass

    async def _part_chunks(self):
        while True:
            i = self._buf.find(self._delim)
            if i >= 0:
                out = self._buf[:i]
                self._buf = self._buf[i + len(self._delim):]
                self._part_done = True
                if out:
                    yield out
                return
            keep = len(self._delim) - 1  # a delimiter prefix may span chunks
            if len(self._buf) > keep:
                out, self._buf = self._buf[:-keep], self._buf[-keep:]
                if out:
                    yield out
            if not await self._fill():
                self._part_done = True  # truncated body: flush what's left
                if self._buf:
                    out, self._buf = self._buf, b""
                    yield out
                return


@dataclass
class Request:
    method: str
    path: str
    query: dict[str, list[str]]
    headers: dict[str, str]
    body: bytes = b""
    # set on streaming routes: the body arrives through this reader instead
    body_reader: "BodyReader | MemoryBodyReader | None" = None

    def json(self):
        return json.loads(self.body.decode("utf-8") or "null")

    def multipart(self) -> list[tuple[dict, bytes]]:
        """Parse multipart/form-data → [(part_headers, part_body)]."""
        ctype = self.headers.get("content-type", "")
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            raise ValueError("no multipart boundary")
        boundary = b"--" + m.group(1).encode()
        parts = []
        for raw in self.body.split(boundary)[1:]:
            raw = raw.strip(b"\r\n")
            if raw in (b"", b"--"):
                continue
            if raw.endswith(b"--"):
                raw = raw[:-2]
            head, _, body = raw.partition(b"\r\n\r\n")
            headers: dict[str, str] = {}
            for line in head.decode("utf-8", "replace").split("\r\n"):
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            parts.append((headers, body.rstrip(b"\r\n")))
        return parts


@dataclass
class Response:
    status: int = 200
    body: bytes | str = b""
    content_type: str = "application/json"
    headers: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def json_response(obj, status: int = 200) -> "Response":
        return Response(status, json.dumps(obj).encode(), "application/json")

    @staticmethod
    def error(status: int, detail: str) -> "Response":
        return Response.json_response({"detail": detail}, status)


class StreamingResponse:
    def __init__(self, gen: AsyncIterator[str], content_type: str = "text/plain"):
        self.gen = gen
        self.content_type = content_type


class WebSocket:
    """Server-side WebSocket (text frames only)."""

    def __init__(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        self.reader = reader
        self.writer = writer
        self.closed = False

    async def send_text(self, text: str) -> None:
        data = text.encode("utf-8")
        header = bytes([0x81])  # FIN + text opcode
        n = len(data)
        if n < 126:
            header += bytes([n])
        elif n < 65536:
            header += bytes([126]) + struct.pack(">H", n)
        else:
            header += bytes([127]) + struct.pack(">Q", n)
        self.writer.write(header + data)
        await self.writer.drain()

    async def recv_text(self) -> str | None:
        """→ text payload, or None on close."""
        buf = b""
        while True:
            head = await self.reader.readexactly(2)
            fin = head[0] & 0x80
            opcode = head[0] & 0x0F
            masked = head[1] & 0x80
            n = head[1] & 0x7F
            if n == 126:
                n = struct.unpack(">H", await self.reader.readexactly(2))[0]
            elif n == 127:
                n = struct.unpack(">Q", await self.reader.readexactly(8))[0]
            if n + len(buf) > MAX_BODY:  # frame length is client-controlled
                await self.close(1009)  # 1009 = message too big
                return None
            mask = await self.reader.readexactly(4) if masked else b"\0\0\0\0"
            payload = await self.reader.readexactly(n)
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
            if opcode == 0x8:  # close
                await self.close()
                return None
            if opcode == 0x9:  # ping → pong (control payloads are ≤125 by
                # RFC; clamp so a hostile longer ping can't make the pong
                # length byte overflow into the mask bit)
                payload = payload[:125]
                self.writer.write(bytes([0x8A, len(payload)]) + payload)
                await self.writer.drain()
                continue
            if opcode == 0xA:  # unsolicited pong: ignore, never append —
                continue       # it would corrupt text reassembly
            buf += payload
            if fin:
                return buf.decode("utf-8")

    async def close(self, code: int = 1000) -> None:
        if self.closed:
            return
        self.closed = True
        try:
            self.writer.write(bytes([0x88, 0x02]) + struct.pack(">H", code))
            await self.writer.drain()
        except (ConnectionError, RuntimeError):
            pass


Handler = Callable[[Request], Awaitable[Response | StreamingResponse]]
WsHandler = Callable[[WebSocket, Request], Awaitable[None]]



def _content_length(headers: dict) -> int | None:
    """Parsed non-negative Content-Length; None when invalid (-> 400).

    A hand-rolled parser must not let int() raise into the connection task:
    a non-numeric or negative value from a hostile client would otherwise
    kill the keep-alive loop with an unhandled exception."""
    raw = headers.get("content-length", "0") or "0"
    try:
        clen = int(raw)
    except ValueError:
        return None
    return clen if clen >= 0 else None


class App:
    def __init__(self, name: str = "rassengine"):
        self.name = name
        self.routes: dict[tuple[str, str], Handler] = {}
        self.streaming_routes: set[tuple[str, str]] = set()
        self.ws_routes: dict[str, WsHandler] = {}
        self.on_startup: list[Callable[[], Awaitable[None]]] = []

    def route(self, method: str, path: str, streaming: bool = False):
        def deco(fn: Handler):
            self.routes[(method.upper(), path)] = fn
            if streaming:
                # handler reads the body incrementally via req.body_reader
                self.streaming_routes.add((method.upper(), path))
            return fn
        return deco

    def websocket(self, path: str):
        def deco(fn: WsHandler):
            self.ws_routes[path] = fn
            return fn
        return deco

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        try:
            while True:
                try:
                    line = await reader.readline()
                except ValueError:   # start line past the stream limit
                    return
                if not line:
                    return
                try:
                    method, target, _version = line.decode("latin-1").split()
                except ValueError:
                    return
                headers: dict[str, str] = {}
                try:
                    while True:
                        h = await reader.readline()
                        if h in (b"\r\n", b"\n", b""):
                            break
                        k, _, v = h.decode("latin-1").partition(":")
                        headers[k.strip().lower()] = v.strip()
                except ValueError:   # a header line past the stream limit
                    await self._write(writer,
                                      Response.error(431, "header too large"))
                    return
                parsed = urlsplit(target)
                path = unquote(parsed.path)
                query = parse_qs(parsed.query)
                is_ws = headers.get("upgrade", "").lower() == "websocket"
                chunked = "chunked" in headers.get("transfer-encoding", "").lower()
                if (not is_ws and not chunked
                        and (method.upper(), path) in self.streaming_routes):
                    # streaming route: hand the socket to the handler instead
                    # of buffering (incremental multipart with early size
                    # rejection); the connection closes afterwards since any
                    # unread remainder would desync keep-alive framing
                    clen = _content_length(headers)
                    if clen is None:
                        await self._write(writer,
                                          Response.error(400, "bad content-length"))
                        return
                    if clen > MAX_BODY:  # total bound; per-file limits are
                        await self._write(writer,  # enforced by the handler
                                          Response.error(413, "body too large"))
                        return
                    req = Request(method.upper(), path, query, headers, b"",
                                  body_reader=BodyReader(reader, clen))
                    handler = self.routes[(req.method, path)]
                    try:
                        resp = await handler(req)
                    except Exception as e:
                        log.exception("handler error on %s %s", method, path)
                        resp = Response.error(500, str(e))
                    if isinstance(resp, StreamingResponse):
                        await self._write_streaming(writer, resp)
                    else:
                        await self._write(writer, resp)
                    return
                if chunked:
                    try:
                        body = await self._read_chunked(reader)
                    except ValueError:
                        await self._write(writer, Response.error(400, "malformed chunked body"))
                        return
                    if body is None:
                        await self._write(writer, Response.error(413, "body too large"))
                        return
                else:
                    clen = _content_length(headers)
                    if clen is None:
                        await self._write(writer,
                                          Response.error(400, "bad content-length"))
                        return
                    if clen > MAX_BODY:
                        await self._write(writer, Response.error(413, "body too large"))
                        return
                    body = await reader.readexactly(clen) if clen else b""
                req = Request(method.upper(), path, query, headers, body)

                if headers.get("upgrade", "").lower() == "websocket":
                    await self._handle_ws(reader, writer, req)
                    return

                handler = self.routes.get((req.method, path))
                if handler is None:
                    await self._write(writer, Response.error(404, "not found"))
                else:
                    try:
                        resp = await handler(req)
                    except Exception as e:
                        log.exception("handler error on %s %s", method, path)
                        resp = Response.error(500, str(e))
                    if isinstance(resp, StreamingResponse):
                        await self._write_streaming(writer, resp)
                        return  # streaming closes the connection
                    await self._write(writer, resp)
                if headers.get("connection", "").lower() == "close":
                    return
        except (asyncio.IncompleteReadError, ConnectionError):
            pass
        finally:
            try:
                writer.close()
            except RuntimeError:
                pass

    async def _read_chunked(self, reader: asyncio.StreamReader) -> bytes | None:
        """RFC 7230 chunked request body; None when over MAX_BODY.

        Raises ValueError on a malformed chunk-size line.
        """
        chunks = []
        total = 0
        while True:
            size_line = await reader.readline()
            try:
                size = int(size_line.strip().split(b";")[0], 16)
            except ValueError:
                # a malformed size line is a protocol error, not end-of-body —
                # silently truncating here would hand the handler a partial body
                raise ValueError("malformed chunk-size line")
            if size == 0:
                await reader.readline()  # trailing CRLF (no trailer support)
                return b"".join(chunks)
            total += size
            if total > MAX_BODY:
                return None
            chunks.append(await reader.readexactly(size))
            await reader.readexactly(2)  # chunk CRLF

    async def _handle_ws(self, reader, writer, req: Request):
        key = req.headers.get("sec-websocket-key", "")
        handler = self.ws_routes.get(req.path)
        if not key or handler is None:
            await self._write(writer, Response.error(400, "bad websocket request"))
            return
        accept = base64.b64encode(
            hashlib.sha1((key + _WS_MAGIC).encode()).digest()
        ).decode()
        writer.write(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            + f"Sec-WebSocket-Accept: {accept}\r\n\r\n".encode()
        )
        await writer.drain()
        ws = WebSocket(reader, writer)
        try:
            await handler(ws, req)
        except (asyncio.IncompleteReadError, ConnectionError):
            pass
        finally:
            await ws.close()

    async def _write(self, writer, resp: Response):
        body = resp.body.encode() if isinstance(resp.body, str) else resp.body
        head = (
            f"HTTP/1.1 {resp.status} X\r\nContent-Type: {resp.content_type}\r\n"
            f"Content-Length: {len(body)}\r\n"
        )
        for k, v in resp.headers.items():
            head += f"{k}: {v}\r\n"
        writer.write(head.encode() + b"\r\n" + body)
        await writer.drain()

    async def _write_streaming(self, writer, resp: StreamingResponse):
        writer.write(
            f"HTTP/1.1 200 OK\r\nContent-Type: {resp.content_type}\r\n"
            "Transfer-Encoding: chunked\r\nConnection: close\r\n\r\n".encode()
        )
        await writer.drain()
        async for chunk in resp.gen:
            data = chunk.encode() if isinstance(chunk, str) else chunk
            if not data:
                continue
            writer.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            await writer.drain()
        writer.write(b"0\r\n\r\n")
        await writer.drain()

    async def serve(self, host: str, port: int):
        for fn in self.on_startup:
            await fn()
        server = await asyncio.start_server(self._handle, host, port)
        log.info("%s listening on %s:%d", self.name, host, port)
        async with server:
            await server.serve_forever()

    async def start(self, host: str, port: int) -> asyncio.AbstractServer:
        """Start without blocking (tests)."""
        for fn in self.on_startup:
            await fn()
        return await asyncio.start_server(self._handle, host, port)
