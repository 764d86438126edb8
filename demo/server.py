"""Live streaming demo server (reference demo/ equivalent, dependency-free).

Mirrors the reference's FastAPI app surface
(/root/reference/demo/app.py:47-146, connection_manager.py, vid2vid.py):

  WS   /api/ws/{user_id}        params JSON + JPEG frames in
  GET  /api/stream/{user_id}    multipart MJPEG out
  GET  /api/settings            pipeline input schema
  GET  /api/queue               queue size
  GET  /                        single-file frontend (camera -> WS -> MJPEG)

Implemented on stdlib asyncio with a minimal RFC6455 WebSocket layer — no
fastapi/uvicorn in this environment. One pipeline instance is shared;
per-user queues gate admission (ServerFullException -> HTTP 503 behaviour).

The vid2vid warmup state machine matches the reference demo: the first 8
frames of a session (or after a prompt change) accumulate into the warmup
buffer, then streaming begins (demo/vid2vid.py:120-144).
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import hashlib
import io
import json
import logging
import struct
import time
import uuid
from typing import Dict, Optional

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
log = logging.getLogger("live2diff-tpu.demo")

WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

INPUT_PARAMS_SCHEMA = {
    "prompt": {"type": "str", "default": "a person", "title": "Prompt"},
    "width": {"type": "int", "default": 512, "hide": True},
    "height": {"type": "int", "default": 512, "hide": True},
}


class ServerFullException(Exception):
    pass


# ---------------------------------------------------------------------------
# pipeline wrapper with the demo warmup state machine
# ---------------------------------------------------------------------------


class DemoPipeline:
    WARMUP_FRAMES = 8

    def __init__(self, config_path: str, height: int, width: int,
                 synthetic: bool = False, tiny: bool = False):
        self.height, self.width = height, width
        self.synthetic = synthetic
        self.warmup_buffer = []
        self.current_prompt: Optional[str] = None
        self.stream = None
        if not synthetic:
            from live2diff_tpu.wrapper import StreamV2VWrapper

            kwargs = {}
            if tiny:
                kwargs.update(
                    unet_overrides=dict(
                        block_out_channels=(8, 16, 16, 16), attention_head_dim=2,
                        norm_num_groups=4, motion_num_attention_heads=2,
                    ),
                    dtype="float32", use_depth=False,
                )
            self.stream = StreamV2VWrapper(
                config_path, height=height, width=width, output_type="np", **kwargs
            )

    def predict(self, params: dict, frame: np.ndarray) -> Optional[np.ndarray]:
        prompt = params.get("prompt", "")
        if self.synthetic:  # loopback mode for serving-layer tests
            return 255 - frame
        if prompt != self.current_prompt:
            self.current_prompt = prompt
            self.warmup_buffer = []
        if len(self.warmup_buffer) < self.WARMUP_FRAMES:
            self.warmup_buffer.append(frame)
            if len(self.warmup_buffer) == self.WARMUP_FRAMES:
                self.stream.prepare(prompt, np.stack(self.warmup_buffer))
            return None
        out = self.stream(frame)
        return out  # uint8 HWC


# ---------------------------------------------------------------------------
# connection manager (per-user frame queues)
# ---------------------------------------------------------------------------


class ConnectionManager:
    def __init__(self, max_queue_size: int = 4, max_users: int = 4):
        self.queues: Dict[str, asyncio.Queue] = {}
        self.max_queue_size = max_queue_size
        self.max_users = max_users

    def connect(self, user_id: str) -> asyncio.Queue:
        if len(self.queues) >= self.max_users and user_id not in self.queues:
            raise ServerFullException("server at capacity")
        q = asyncio.Queue(maxsize=self.max_queue_size)
        self.queues[user_id] = q
        return q

    def disconnect(self, user_id: str) -> None:
        self.queues.pop(user_id, None)

    async def put(self, user_id: str, item) -> None:
        q = self.queues.get(user_id)
        if q is None:
            return
        if q.full():  # drop oldest to stay real-time
            try:
                q.get_nowait()
            except asyncio.QueueEmpty:
                pass
        await q.put(item)

    def queue_size(self) -> int:
        return len(self.queues)


# ---------------------------------------------------------------------------
# minimal HTTP + WebSocket handling
# ---------------------------------------------------------------------------


async def read_http_request(reader: asyncio.StreamReader):
    request_line = await reader.readline()
    if not request_line:
        return None
    parts = request_line.decode("latin1").strip().split()
    if len(parts) < 3:
        return None
    method, path = parts[0], parts[1]
    headers = {}
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        k, _, v = line.decode("latin1").partition(":")
        headers[k.strip().lower()] = v.strip()
    body = b""
    if "content-length" in headers:
        body = await reader.readexactly(int(headers["content-length"]))
    return method, path, headers, body


def http_response(status: str, body: bytes, content_type: str = "application/json",
                  extra: str = "") -> bytes:
    return (
        f"HTTP/1.1 {status}\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\nAccess-Control-Allow-Origin: *\r\n"
        f"{extra}Connection: close\r\n\r\n"
    ).encode() + body


async def ws_handshake(writer: asyncio.StreamWriter, headers: dict) -> bool:
    key = headers.get("sec-websocket-key")
    if not key:
        return False
    accept = base64.b64encode(
        hashlib.sha1((key + WS_MAGIC).encode()).digest()
    ).decode()
    writer.write(
        (
            "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Accept: {accept}\r\n\r\n"
        ).encode()
    )
    await writer.drain()
    return True


async def ws_recv(reader: asyncio.StreamReader):
    """-> (opcode, payload) or None on close."""
    hdr = await reader.readexactly(2)
    fin_op, mask_len = hdr
    opcode = fin_op & 0x0F
    masked = mask_len & 0x80
    length = mask_len & 0x7F
    if length == 126:
        length = struct.unpack(">H", await reader.readexactly(2))[0]
    elif length == 127:
        length = struct.unpack(">Q", await reader.readexactly(8))[0]
    mask = await reader.readexactly(4) if masked else b"\x00" * 4
    payload = bytearray(await reader.readexactly(length))
    if masked:
        for i in range(length):
            payload[i] ^= mask[i % 4]
    if opcode == 0x8:
        return None
    return opcode, bytes(payload)


def ws_frame(payload: bytes, opcode: int = 0x1) -> bytes:
    header = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        header += bytes([n])
    elif n < (1 << 16):
        header += bytes([126]) + struct.pack(">H", n)
    else:
        header += bytes([127]) + struct.pack(">Q", n)
    return header + payload


async def ws_send_json(writer: asyncio.StreamWriter, obj) -> None:
    writer.write(ws_frame(json.dumps(obj).encode(), 0x1))
    await writer.drain()


# ---------------------------------------------------------------------------
# image codecs (PIL-backed)
# ---------------------------------------------------------------------------


def jpeg_to_array(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def array_to_jpeg(arr: np.ndarray, quality: int = 80) -> bytes:
    try:
        from live2diff_tpu.serve import framepump

        encoded = framepump.encode_jpeg(np.ascontiguousarray(arr), quality)
        if encoded is not None:
            return encoded
    except Exception:
        pass
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# the app
# ---------------------------------------------------------------------------


class App:
    def __init__(self, pipeline: DemoPipeline, max_queue_size: int = 4,
                 timeout: float = 0.0, debug: bool = False):
        self.pipeline = pipeline
        self.manager = ConnectionManager(max_queue_size=max_queue_size)
        self.outputs: Dict[str, asyncio.Queue] = {}
        self.timeout = timeout
        self.debug = debug

    async def handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        try:
            req = await read_http_request(reader)
            if req is None:
                return
            method, path, headers, body = req

            if path.startswith("/api/ws/"):
                await self.handle_ws(path.split("/")[-1], reader, writer, headers)
                return
            if path.startswith("/api/stream/"):
                await self.handle_mjpeg(path.split("/")[-1], writer)
                return
            if path == "/api/settings":
                writer.write(http_response(
                    "200 OK", json.dumps({"input_params": INPUT_PARAMS_SCHEMA,
                                          "max_queue_size": self.manager.max_queue_size,
                                          "page_content": ""}).encode()))
            elif path == "/api/queue":
                writer.write(http_response(
                    "200 OK", json.dumps({"queue_size": self.manager.queue_size()}).encode()))
            elif path == "/" or path == "/index.html":
                writer.write(http_response("200 OK", FRONTEND.encode(), "text/html"))
            else:
                writer.write(http_response("404 Not Found", b'{"error":"not found"}'))
            await writer.drain()
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        except ServerFullException:
            writer.write(http_response("503 Service Unavailable", b'{"error":"full"}'))
            await writer.drain()
        finally:
            try:
                writer.close()
            except Exception:
                pass

    async def handle_ws(self, user_id: str, reader, writer, headers):
        queue = self.manager.connect(user_id)
        self.outputs.setdefault(user_id, asyncio.Queue(maxsize=2))
        if not await ws_handshake(writer, headers):
            self.manager.disconnect(user_id)
            return
        log.info("ws connect user=%s", user_id)
        await ws_send_json(writer, {"status": "connected", "userId": user_id})
        await ws_send_json(writer, {"status": "send_frame"})
        params: dict = {}
        last_seen = time.time()
        try:
            while True:
                msg = await ws_recv(reader)
                if msg is None:
                    break
                opcode, payload = msg
                if self.timeout and time.time() - last_seen > self.timeout:
                    await ws_send_json(writer, {"status": "timeout"})
                    break
                last_seen = time.time()
                if opcode == 0x9:  # ping
                    writer.write(ws_frame(payload, 0xA))
                    await writer.drain()
                    continue
                if opcode == 0x1:  # text: params or control
                    data = json.loads(payload or b"{}")
                    if data.get("status") == "next_frame":
                        await ws_send_json(writer, {"status": "send_frame"})
                    else:
                        params.update(data)
                    continue
                if opcode == 0x2:  # binary: JPEG frame
                    frame = jpeg_to_array(payload)
                    await self.manager.put(user_id, (dict(params), frame))
                    await self.process_one(user_id)
                    await ws_send_json(writer, {"status": "send_frame"})
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        finally:
            log.info("ws disconnect user=%s", user_id)
            self.manager.disconnect(user_id)

    async def process_one(self, user_id: str) -> None:
        q = self.manager.queues.get(user_id)
        if q is None or q.empty():
            return
        params, frame = await q.get()
        t0 = time.perf_counter()
        loop = asyncio.get_running_loop()
        out = await loop.run_in_executor(None, self.pipeline.predict, params, frame)
        if self.debug:
            log.info("predict %.1f ms", (time.perf_counter() - t0) * 1000)
        if out is None:
            return
        oq = self.outputs[user_id]
        if oq.full():
            try:
                oq.get_nowait()
            except asyncio.QueueEmpty:
                pass
        await oq.put(out)

    async def handle_mjpeg(self, user_id: str, writer: asyncio.StreamWriter):
        writer.write(
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: multipart/x-mixed-replace; boundary=frame\r\n"
            b"Cache-Control: no-cache\r\nConnection: close\r\n\r\n"
        )
        await writer.drain()
        oq = self.outputs.setdefault(user_id, asyncio.Queue(maxsize=2))
        try:
            while True:
                out = await oq.get()
                jpg = array_to_jpeg(out)
                writer.write(
                    b"--frame\r\nContent-Type: image/jpeg\r\n"
                    + f"Content-Length: {len(jpg)}\r\n\r\n".encode() + jpg + b"\r\n"
                )
                await writer.drain()
        except (ConnectionResetError, BrokenPipeError):
            pass


FRONTEND = """<!doctype html>
<html><head><meta charset="utf-8"><title>live2diff-tpu</title>
<style>body{font-family:sans-serif;background:#111;color:#eee;display:flex;
flex-direction:column;align-items:center;gap:12px;padding:20px}
.row{display:flex;gap:12px}video,img{width:384px;height:384px;background:#000;
border-radius:8px;object-fit:cover}input{width:500px;padding:6px}
button{padding:8px 16px}</style></head><body>
<h2>live2diff-tpu — real-time video-to-video</h2>
<input id="prompt" value="a person"/>
<div class="row"><video id="cam" autoplay muted playsinline></video>
<img id="out"/></div>
<button id="start">Start</button>
<script>
const uid = crypto.randomUUID();
let ws, sending = false;
const cam = document.getElementById('cam'), out = document.getElementById('out');
const canvas = document.createElement('canvas'); canvas.width = canvas.height = 512;
document.getElementById('start').onclick = async () => {
  const stream = await navigator.mediaDevices.getUserMedia({video: true});
  cam.srcObject = stream;
  ws = new WebSocket(`ws://${location.host}/api/ws/${uid}`);
  ws.onmessage = async (ev) => {
    const msg = JSON.parse(ev.data);
    if (msg.status === 'send_frame' && !sending) {
      sending = true;
      ws.send(JSON.stringify({prompt: document.getElementById('prompt').value}));
      const ctx = canvas.getContext('2d');
      ctx.drawImage(cam, 0, 0, 512, 512);
      canvas.toBlob(async b => { ws.send(await b.arrayBuffer()); sending = false; },
                    'image/jpeg', 0.85);
    }
  };
  out.src = `/api/stream/${uid}`;
};
</script></body></html>
"""


async def amain(args) -> None:
    pipeline = DemoPipeline(args.config, args.height, args.width,
                            synthetic=args.synthetic, tiny=args.tiny)
    app = App(pipeline, max_queue_size=args.max_queue_size,
              timeout=args.timeout, debug=args.debug)
    server = await asyncio.start_server(app.handle, args.host, args.port)
    log.info("serving on http://%s:%d", args.host, args.port)
    async with server:
        await server.serve_forever()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/disneyPixar.yaml")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--max-queue-size", type=int, default=4)
    p.add_argument("--timeout", type=float, default=0.0)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="loopback pipeline (serving-layer test mode)")
    p.add_argument("--tiny", action="store_true", help="tiny random-weight model")
    args = p.parse_args()
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.height = args.width = 64
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
