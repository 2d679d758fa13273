"""Serving CLI: sustained on-device batched video generation.

The reference's only inference surface regenerates mp4s offline
(/root/reference/src/infer.py:41-88). This CLI is the production-serving
analogue the headline BASELINE.md inference number corresponds to: the
two-stage sampling path (ggen + cgen) plus the [-1,1]->uint8 quantization
run **on device** inside one jitted ``lax.scan`` chunk, and chunks are
double-buffered so the host drains chunk *k* while the chip generates chunk
*k+1* (JAX async dispatch overlaps them for free).

Usage::

    python -m dcvgan_tpu.cli.serve <result_dir> <iteration> \
        [--batchsize 256] [--iters-per-chunk 4] [--chunks 8] \
        [--sink null|npy|mp4] [--out DIR] [--with-geo] [--seed 0]

Sinks
-----
- ``null``    drain only a per-chunk checksum (a device-side uint32 reduce
              over every generated pixel, so the chip provably produced and
              quantized all videos). Measures the chip's sustained serving
              rate with an on-device consumer.
- ``npy``     fetch uint8 videos and write one ``color_NNNNN.npy`` shard per
              chunk (+ ``geo_NNNNN.npy`` with ``--with-geo``).
- ``mp4``     fetch uint8 videos and write one mp4 per video under
              ``out/color`` (+ rendered geometry under ``out/<geo>`` with
              ``--with-geo``), matching the infer CLI's directory layout.

Prints ONE JSON line with generated and delivered videos/s. On a tunneled
dev chip the delivered rate is bounded by tunnel bandwidth (~8 MB/s); on a
real TPU VM the PCIe link sustains GB/s and the two rates converge.

HTTP mode
---------
``--listen PORT`` starts a network serving endpoint over the same on-device
chunk machinery instead of running a fixed number of chunks:

- ``GET /healthz``                     -> JSON {status, device, model info}
- ``GET /stats``                       -> JSON request/video counters
- ``GET /generate?n=16&seed=0``        -> ``.npy`` bytes, uint8 (n,T,H,W,3)
- ``GET /generate?n=16&seed=0&geo=1``  -> ``.npz`` with ``color`` + ``geo``
- ``POST /generate`` with a JSON body ``{"n": 16, "seed": 0, "geo": false}``
  -> same responses as the GET form (query parameters are ignored on POST).

Seeding and micro-batching: an **explicit** ``seed`` pins the request to its
own deterministic chunk stream (same seed -> identical bytes, replayable
serving). With ``seed`` omitted (or ``seed=auto``) the server picks the
stream, which lets concurrent requests **coalesce into shared device
chunks**: a micro-batcher collects every request waiting within
``--batch-window-ms`` and serves them FIFO slices of one chunk, so ten
concurrent ``n=3`` requests cost one ``batchsize`` dispatch instead of ten.
(The reference has no serving path at all; this is the standard
continuous-batching shape production video services use.)

Resource bounds (explicit, not best-effort):

- **Device**: at most ``queue_depth`` chunks are ever in flight on the
  chip, so device-resident output buffers are bounded regardless of ``n``.
- **Host**: plain color requests STREAM one fetched chunk at a time into
  the socket (host high-water mark = one chunk, not the payload); ``geo``
  requests are buffered (npz is not streamable) and therefore share the
  same videos cap. Requests above ``--max-request-videos`` are rejected
  with **413** and the exact limit in the body.
- **Concurrency**: at most ``--max-concurrent`` requests generate at once;
  excess requests get **429** + ``Retry-After`` instead of queueing
  unboundedly behind the single device queue.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from queue import SimpleQueue
from typing import Optional, Sequence
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

from dcvgan_tpu import prng
from dcvgan_tpu.cli.infer import load_run


def make_chunk_fn(gan, batchsize: int, iters: int, mesh=None):
    """One jitted serving chunk: `iters` sampling rounds scanned on device.

    Returns ``(checksum, xg_u8, xc_u8)`` where the videos are
    ``(iters, B, T, H, W, C)`` uint8 and the checksum is a uint32 reduce
    over all generated pixels (fetching it forces full chunk execution).

    With ``mesh``, the chunk runs SPMD over the mesh's ``data`` axis: state
    and key replicated, the batch dimension of every sampled video sharded
    across chips (XLA partitions the generator convs and the partitionable
    threefry draws; no collectives on the serving path). Output values are
    bit-identical to the unsharded chunk.
    """

    def quantize(x):
        return ((jnp.clip(x, -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)

    def chunk_fn(state, key):
        def body(carry, i):
            k = jax.random.fold_in(key, i)
            xg, xc = gan.sample_videos(state, k, batchsize)
            xg_u8, xc_u8 = quantize(xg), quantize(xc)
            csum = jnp.sum(xc_u8, dtype=jnp.uint32) + jnp.sum(
                xg_u8, dtype=jnp.uint32
            )
            return carry + csum, (xg_u8, xc_u8)

        total, (xg, xc) = jax.lax.scan(
            body, jnp.uint32(0), jnp.arange(iters)
        )
        return total, xg, xc

    if mesh is None:
        return jax.jit(chunk_fn)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from dcvgan_tpu.parallel.mesh import DATA_AXIS

    rep = NamedSharding(mesh, P())
    sharded_videos = NamedSharding(mesh, P(None, DATA_AXIS))  # (iters, B, ...)
    return jax.jit(
        chunk_fn,
        in_shardings=(rep, rep),
        out_shardings=(rep, sharded_videos, sharded_videos),
    )


class Sink:
    """Drains fetched chunks; returns bytes delivered to the host."""

    def __init__(self, kind: str, out: Optional[Path], geo_name: str, with_geo: bool):
        self.kind = kind
        self.out = out
        self.geo_name = geo_name
        self.with_geo = with_geo
        self.pool = ThreadPoolExecutor(max_workers=4)
        self.futures = []
        if kind != "null" and out is not None:
            out.mkdir(parents=True, exist_ok=True)
            if kind == "mp4":
                (out / "color").mkdir(exist_ok=True)
                if with_geo:
                    (out / geo_name).mkdir(exist_ok=True)

    def drain(self, chunk_idx: int, csum, xg, xc) -> int:
        """Fetch what this sink needs; return host-delivered payload bytes."""
        int(csum)  # always: forces chunk execution on device
        if self.kind == "null":
            return 0
        xc_np = np.asarray(xc)  # (iters, B, T, H, W, 3) uint8
        nbytes = xc_np.nbytes
        xg_np = None
        if self.with_geo:
            xg_np = np.asarray(xg)
            nbytes += xg_np.nbytes
        self.futures.append(
            self.pool.submit(self._write, chunk_idx, xg_np, xc_np)
        )
        return nbytes

    def _write(self, chunk_idx: int, xg_np, xc_np) -> None:
        if self.kind == "npy":
            np.save(self.out / f"color_{chunk_idx:05d}.npy", xc_np)
            if xg_np is not None:
                np.save(self.out / f"geo_{chunk_idx:05d}.npy", xg_np)
            return
        # mp4: flatten (iters, B) -> videos, same layout as the infer CLI
        from dcvgan_tpu.io.video import write_videos_parallel
        from dcvgan_tpu.utils.video_np import geometric_info_in_color_format

        videos = xc_np.reshape((-1,) + xc_np.shape[2:])
        base = chunk_idx * len(videos)
        write_videos_parallel(
            videos,
            [self.out / "color" / f"{base + i:06d}.mp4" for i in range(len(videos))],
        )
        if xg_np is not None:
            geo = xg_np.reshape((-1,) + xg_np.shape[2:])
            geo = geo.astype(np.float32) / 127.5 - 1.0  # undo serving quantization
            geo = geometric_info_in_color_format(geo, self.geo_name)
            write_videos_parallel(
                geo,
                [
                    self.out / self.geo_name / f"{base + i:06d}.mp4"
                    for i in range(len(geo))
                ],
            )

    def close(self) -> None:
        for f in self.futures:
            f.result()
        self.pool.shutdown()


def serve(
    gan,
    state,
    batchsize: int,
    iters_per_chunk: int,
    chunks: int,
    sink: Sink,
    seed: int = 0,
    queue_depth: int = 2,
    mesh=None,
) -> dict:
    """Run the double-buffered serving loop; return the stats record."""
    queue_depth = max(1, queue_depth)  # 0 would drain an empty deque
    if mesh is not None:
        from dcvgan_tpu.parallel.mesh import replicate

        state = replicate(state, mesh)
    chunk_fn = make_chunk_fn(gan, batchsize, iters_per_chunk, mesh)
    key = prng.base_key(seed)

    # compile (excluded from the sustained measurement); fetch the checksum
    # rather than block_until_ready — under a tunneled backend the latter
    # can return before remote execution finishes (see PERFORMANCE.md)
    warm = chunk_fn(state, prng.for_step(key, 10**6))
    int(warm[0])

    videos_per_chunk = batchsize * iters_per_chunk
    pending: deque = deque()
    delivered_bytes = 0
    t0 = time.perf_counter()
    for k in range(chunks):
        pending.append((k, chunk_fn(state, prng.for_step(key, k))))
        # keep `queue_depth` chunks in flight; drain the oldest beyond that
        while len(pending) > queue_depth - 1:
            idx, (csum, xg, xc) = pending.popleft()
            delivered_bytes += sink.drain(idx, csum, xg, xc)
    while pending:
        idx, (csum, xg, xc) = pending.popleft()
        delivered_bytes += sink.drain(idx, csum, xg, xc)
    gen_dt = time.perf_counter() - t0
    sink.close()
    total_dt = time.perf_counter() - t0

    n_videos = videos_per_chunk * chunks
    n_chips = mesh.size if mesh is not None else jax.device_count()
    return {
        "metric": "serve_videos_per_sec_per_chip",
        "value": round(n_videos / gen_dt / n_chips, 2),
        "unit": "videos/s",
        "sink": sink.kind,
        "videos": n_videos,
        "batchsize": batchsize,
        "iters_per_chunk": iters_per_chunk,
        "chunks": chunks,
        "generate_plus_drain_s": round(gen_dt, 3),
        "total_s_incl_writes": round(total_dt, 3),
        "delivered_videos_per_sec": (
            round(n_videos / total_dt, 2) if sink.kind != "null" else None
        ),
        "delivered_MB_per_sec": (
            round(delivered_bytes / 1e6 / total_dt, 2) if delivered_bytes else None
        ),
        "n_chips": n_chips,
        "device": jax.devices()[0].device_kind,
    }


class GenerationServer:
    """Request-oriented wrapper over the on-device chunk generator.

    One compiled chunk function serves every request; requests needing more
    than one chunk pipeline them (dispatch chunk k+1 before fetching chunk
    k). Device dispatch is serialized under a lock — a single chip has one
    execution queue — while host-side fetch/encode runs outside it.
    """

    def __init__(
        self,
        gan,
        state,
        batchsize: int = 64,
        iters_per_chunk: int = 1,
        geo_name: str = "depth",
        mesh=None,
        queue_depth: int = 2,
        max_request_videos: int = 4096,
        max_concurrent: int = 4,
        batch_window_ms: float = 5.0,
    ):
        self.batchsize = batchsize
        self.iters = iters_per_chunk
        self.geo_name = geo_name
        self.n_chips = 1 if mesh is None else mesh.size
        self.queue_depth = max(1, queue_depth)
        self.max_request_videos = max_request_videos
        self._admission = threading.BoundedSemaphore(max(1, max_concurrent))
        if mesh is not None:
            from dcvgan_tpu.parallel.mesh import replicate

            state = replicate(state, mesh)
        self.state = state
        self.chunk_fn = make_chunk_fn(gan, batchsize, iters_per_chunk, mesh)
        self._lock = threading.Lock()  # device dispatch order
        self._counter_lock = threading.Lock()
        self._t0 = time.perf_counter()
        self.counters = {"requests": 0, "videos_served": 0, "errors": 0,
                         "rejected": 0, "batched_requests": 0,
                         "batched_chunks": 0}
        csum, _, xc = self.chunk_fn(state, prng.base_key(0))  # compile + warm
        int(csum)
        self.video_shape = tuple(xc.shape[2:])  # (T, H, W, C)
        self.batcher = MicroBatcher(self, window_s=batch_window_ms / 1000.0)

    def close(self) -> None:
        self.batcher.close()

    def count(self, name: str, inc: int = 1) -> None:
        with self._counter_lock:
            self.counters[name] += inc

    def admit(self) -> bool:
        """Non-blocking admission slot; False means the caller should 429."""
        return self._admission.acquire(blocking=False)

    def release(self) -> None:
        self._admission.release()

    def generate_chunks(self, n: int, seed: int, with_geo: bool = False):
        """Yield ``(geo | None, color)`` uint8 chunk arrays totalling
        exactly n videos.

        Keeps at most ``queue_depth`` chunks in flight: chunk k+1..k+depth
        dispatch while chunk k is fetched, bounding device-resident output
        buffers (a large n must not enqueue its whole request on the chip);
        yielding per chunk bounds the HOST high-water mark the same way.
        """
        per_chunk = self.batchsize * self.iters
        n_chunks = (n + per_chunk - 1) // per_chunk
        key = prng.base_key(seed)
        pending: deque = deque()
        produced = 0

        def fetch_one():
            nonlocal produced
            csum, xg, xc = pending.popleft()
            int(csum)
            color = np.asarray(xc).reshape((-1,) + xc.shape[2:])
            take = min(len(color), n - produced)
            produced += take
            geo = None
            if with_geo:
                geo = np.asarray(xg).reshape((-1,) + xg.shape[2:])[:take]
            return geo, color[:take]

        for k in range(n_chunks):
            with self._lock:
                pending.append(self.chunk_fn(self.state, prng.for_step(key, k)))
            while len(pending) >= self.queue_depth:
                yield fetch_one()
        while pending:
            yield fetch_one()
        self.count("requests")
        self.count("videos_served", n)

    def generate(self, n: int, seed: int, with_geo: bool = False):
        """Return (geo | None, color) uint8 arrays of exactly n videos."""
        xgs, xcs = [], []
        for geo, color in self.generate_chunks(n, seed, with_geo):
            xcs.append(color)
            if with_geo:
                xgs.append(geo)
        color = np.concatenate(xcs)
        geo = np.concatenate(xgs) if with_geo else None
        return geo, color

    def info(self) -> dict:
        return {
            "status": "ok",
            "device": jax.devices()[0].device_kind,
            "n_chips": self.n_chips,
            "batchsize": self.batchsize,
            "iters_per_chunk": self.iters,
            "geometric_info": self.geo_name,
            "uptime_s": round(time.perf_counter() - self._t0, 1),
        }


class _PendingRequest:
    """One coalescable request: slices arrive on ``out`` as (geo, color)
    tuples; ``None`` terminates, an Exception propagates a chunk failure."""

    __slots__ = ("remaining", "with_geo", "out", "dead")

    def __init__(self, n: int, with_geo: bool):
        self.remaining = n
        self.with_geo = with_geo
        self.out: SimpleQueue = SimpleQueue()
        self.dead = False  # consumer abandoned (client disconnect)


class MicroBatcher:
    """Coalesces concurrent seedless requests into shared device chunks.

    One worker thread owns a server-side PRNG stream. Each round it waits
    ``window_s`` for concurrent arrivals to pile up, dispatches ONE chunk
    (under the server's device lock, so it interleaves fairly with seeded
    requests), and deals the fetched videos to the waiting requests FIFO.
    N concurrent small requests therefore cost ``ceil(sum(n_i)/chunk)``
    dispatches instead of N. Host memory is bounded per request by its own
    ``n`` (a slow consumer buffers at most its own videos, which the 413
    cap already bounds).

    Geometry streams are fetched from the device only in rounds where the
    FIFO head wants them; a geo request behind color-only traffic simply
    starts the next round (FIFO order is never violated).
    """

    def __init__(self, server: "GenerationServer", window_s: float = 0.005,
                 seed: int = 0):
        self.server = server
        self.window_s = max(0.0, window_s)
        self._cv = threading.Condition()
        self._waiting: deque = deque()
        self._closed = False
        # dedicated stream, disjoint from any client-pinned seed's stream
        self._key = prng.named(prng.base_key(seed), "serve-microbatch")
        self._step = 0
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="serve-microbatcher"
        )
        self._thread.start()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def submit(self, n: int, with_geo: bool = False):
        """Yield ``(geo | None, color)`` uint8 slices totalling n videos."""
        req = _PendingRequest(n, with_geo)
        with self._cv:
            if self._closed:
                raise RuntimeError("server is shutting down")
            self._waiting.append(req)
            self._cv.notify_all()
        try:
            while True:
                item = req.out.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
            self.server.count("requests")
            self.server.count("batched_requests")
            self.server.count("videos_served", n)
        finally:
            # consumer gone (disconnect / error): stop generating for it
            with self._cv:
                req.dead = True
                if req in self._waiting:
                    self._waiting.remove(req)

    def _live(self):
        return [r for r in self._waiting if not r.dead]

    def _loop(self) -> None:
        capacity = self.server.batchsize * self.server.iters
        while True:
            with self._cv:
                while not self._live() and not self._closed:
                    self._cv.wait()
                if self._closed:
                    for r in self._live():
                        r.out.put(RuntimeError("server is shutting down"))
                    self._waiting.clear()
                    return
                # coalescing window: let concurrent arrivals join this chunk
                deadline = time.perf_counter() + self.window_s
                while (sum(r.remaining for r in self._live()) < capacity):
                    left = deadline - time.perf_counter()
                    if left <= 0:
                        break
                    self._cv.wait(timeout=left)
                live = self._live()
                if not live:  # every waiter died during the window
                    continue
                want_geo = live[0].with_geo
            k = self._step
            self._step += 1
            try:
                with self.server._lock:
                    csum, xg, xc = self.server.chunk_fn(
                        self.server.state, prng.for_step(self._key, k)
                    )
                int(csum)
                color = np.asarray(xc).reshape((-1,) + xc.shape[2:])
                geo = None
                if want_geo:
                    geo = np.asarray(xg).reshape((-1,) + xg.shape[2:])
            except Exception as e:
                # fail only the requests this chunk was dispatched for;
                # arrivals during its execution stay queued for the next
                # round (their chunk hasn't been attempted yet)
                self.server.count("errors")
                with self._cv:
                    for r in live:
                        if not r.dead:
                            r.out.put(e)
                        if r in self._waiting:
                            self._waiting.remove(r)
                continue
            self.server.count("batched_chunks")
            off = 0
            with self._cv:
                while off < len(color) and self._waiting:
                    r = self._waiting[0]
                    if r.dead:
                        self._waiting.popleft()
                        continue
                    if r.with_geo and geo is None:
                        break  # next round fetches geometry for this head
                    take = min(r.remaining, len(color) - off)
                    r.out.put((
                        geo[off:off + take].copy() if r.with_geo else None,
                        color[off:off + take].copy(),
                    ))
                    r.remaining -= take
                    off += take
                    if r.remaining == 0:
                        r.out.put(None)
                        self._waiting.popleft()


class _Handler(BaseHTTPRequestHandler):
    server_version = "dcvgan-tpu-serve/1.0"
    gen: GenerationServer  # set on the handler class by serve_http

    def log_message(self, fmt, *args):  # quiet: stats endpoint instead
        pass

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:
        url = urlparse(self.path)
        if url.path == "/healthz":
            self._json(200, self.gen.info())
            return
        if url.path == "/stats":
            with self.gen._counter_lock:
                counters = dict(self.gen.counters)
            self._json(200, dict(counters, **self.gen.info()))
            return
        if url.path != "/generate":
            self._json(404, {"error": f"unknown path {url.path}"})
            return
        self._generate(parse_qs(url.query))

    def do_POST(self) -> None:
        """POST /generate with a JSON body {"n": .., "seed": .., "geo": ..}."""
        url = urlparse(self.path)
        if url.path != "/generate":
            self._json(404, {"error": f"unknown path {url.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0) or 0)
            if length > 1_000_000:
                self._json(413, {"error": "request body too large"})
                return
            if length < 0:
                # rfile.read(-1) would block until EOF, pinning this
                # handler thread for as long as the client keeps the
                # socket open — reject before reading
                raise ValueError(f"bad Content-Length {length}")
            body = json.loads(self.rfile.read(length) or b"{}")
            if not isinstance(body, dict):
                raise ValueError("body must be a JSON object")
        except (ValueError, json.JSONDecodeError) as e:
            self.gen.count("errors")
            self._json(400, {"error": f"bad JSON body: {e}"})
            return
        self._generate({k: [str(v)] for k, v in body.items()})

    def _generate(self, q: dict) -> None:
        try:
            n = int(q.get("n", ["16"])[0])
            raw_seed = q.get("seed", ["auto"])[0]
            seed = None if str(raw_seed).lower() in ("auto", "none", "") \
                else int(raw_seed)
            with_geo = q.get("geo", ["0"])[0].lower() not in (
                "0", "", "false", "none",
            )
            if n < 1:
                raise ValueError(f"n={n} must be >= 1")
        except ValueError as e:
            self.gen.count("errors")
            self._json(400, {"error": str(e)})
            return
        limit = self.gen.max_request_videos
        if with_geo:
            limit //= 2  # npz responses are buffered and carry two arrays
        if n > limit:
            self.gen.count("rejected")
            self._json(
                413,
                {
                    "error": f"n={n} exceeds the per-request limit {limit}"
                    + (" (geo responses are buffered)" if with_geo else ""),
                    "max_request_videos": limit,
                },
            )
            return
        if not self.gen.admit():
            self.gen.count("rejected")
            self.send_response(429)
            body = json.dumps(
                {"error": "server at max concurrent generate requests"}
            ).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Retry-After", "1")
            self.end_headers()
            self.wfile.write(body)
            return
        try:
            if seed is None:  # server-picked stream -> coalescable
                chunks = self.gen.batcher.submit(n, with_geo)
            else:  # pinned stream -> deterministic, dedicated chunks
                chunks = self.gen.generate_chunks(n, seed, with_geo)
            if with_geo:
                self._respond_npz(chunks)
            else:
                self._stream_npy(n, chunks)
        finally:
            self.gen.release()

    def _respond_npz(self, chunks) -> None:
        """Buffered npz response (color + geo); bounded by the videos cap."""
        try:
            geos, colors = [], []
            for geo, color in chunks:
                geos.append(geo)
                colors.append(color)
            geo, color = np.concatenate(geos), np.concatenate(colors)
            buf = io.BytesIO()
            np.savez(buf, color=color, geo=geo)
        except Exception as e:  # chip/transfer failure -> 500, keep serving
            self.gen.count("errors")
            self._json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        body = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", "application/x-npz")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("X-Video-Shape", "x".join(map(str, color.shape)))
        self.end_headers()
        self.wfile.write(body)

    def _stream_npy(self, n: int, chunks) -> None:
        """Stream an npy payload chunk-by-chunk: the exact npy header is
        precomputed from the known video shape, so Content-Length is exact
        and the host never materializes more than one device chunk."""
        shape = (n,) + self.gen.video_shape
        hdr = io.BytesIO()
        np.lib.format.write_array_header_1_0(
            hdr,
            {"descr": "|u1", "fortran_order": False, "shape": shape},
        )
        header = hdr.getvalue()
        total = len(header) + int(np.prod(shape))
        try:
            first = next(chunks)  # surface chip failures before headers go out
        except Exception as e:
            self.gen.count("errors")
            self._json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/x-npy")
        self.send_header("Content-Length", str(total))
        self.send_header("X-Video-Shape", "x".join(map(str, shape)))
        self.end_headers()
        try:
            self.wfile.write(header)
            self.wfile.write(np.ascontiguousarray(first[1]).data)
            for _, color in chunks:
                self.wfile.write(np.ascontiguousarray(color).data)
        except Exception:  # mid-stream failure: connection dies, server lives
            self.gen.count("errors")
            self.close_connection = True


def serve_http(gen: GenerationServer, port: int) -> ThreadingHTTPServer:
    """Bind a ThreadingHTTPServer for `gen` on `port` (0 = ephemeral)."""
    handler = type("BoundHandler", (_Handler,), {"gen": gen})
    return ThreadingHTTPServer(("", port), handler)


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("result_dir", type=Path)
    parser.add_argument("iteration", type=int)
    parser.add_argument("--batchsize", "-b", type=int, default=256)
    parser.add_argument("--iters-per-chunk", type=int, default=4)
    parser.add_argument("--chunks", type=int, default=8)
    parser.add_argument("--sink", choices=["null", "npy", "mp4"], default="null")
    parser.add_argument("--out", type=Path, default=None)
    parser.add_argument("--with-geo", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--queue-depth", type=int, default=2)
    parser.add_argument(
        "--listen",
        type=int,
        default=None,
        metavar="PORT",
        help="start the HTTP serving endpoint instead of a fixed-chunk run",
    )
    parser.add_argument(
        "--max-request-videos",
        type=int,
        default=4096,
        help="per-request n cap (413 beyond it); size to host RAM — geo "
        "requests are capped at half this because npz responses buffer",
    )
    parser.add_argument(
        "--max-concurrent",
        type=int,
        default=4,
        help="concurrent /generate requests admitted before 429",
    )
    parser.add_argument(
        "--batch-window-ms",
        type=float,
        default=5.0,
        help="micro-batching window: how long an unseeded request waits "
        "for concurrent arrivals to share its device chunk",
    )
    parser.add_argument(
        "--mesh",
        type=int,
        default=1,
        metavar="N",
        help="shard each chunk's batch over N chips (-1 = all visible); "
        "1 = single-device serving (default)",
    )
    parser.add_argument(
        "--no-ema",
        action="store_true",
        help="serve the live generator params even when the checkpoint "
        "carries an EMA (A/B the two through the same endpoint)",
    )
    args = parser.parse_args(argv)

    if args.sink != "null" and args.out is None:
        parser.error(f"--sink {args.sink} requires --out DIR")

    cfg, gan, state = load_run(args.result_dir, args.iteration)
    # serve the EMA generators when the checkpoint carries them (identity
    # otherwise) — the averaged params are the deployment artifact
    if not args.no_ema:
        state = state.with_ema_params()
    mesh = None
    if args.mesh != 1:
        from dcvgan_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data=args.mesh, batchsize=args.batchsize)

    if args.listen is not None:
        gen = GenerationServer(
            gan,
            state,
            batchsize=args.batchsize,
            iters_per_chunk=args.iters_per_chunk,
            geo_name=cfg.geometric_info.name,
            mesh=mesh,
            queue_depth=args.queue_depth,
            max_request_videos=args.max_request_videos,
            max_concurrent=args.max_concurrent,
            batch_window_ms=args.batch_window_ms,
        )
        httpd = serve_http(gen, args.listen)
        print(
            json.dumps({"listening": httpd.server_address[1], **gen.info()}),
            flush=True,
        )
        httpd.serve_forever()
        return
    sink = Sink(args.sink, args.out, cfg.geometric_info.name, args.with_geo)
    stats = serve(
        gan,
        state,
        args.batchsize,
        args.iters_per_chunk,
        args.chunks,
        sink,
        seed=args.seed,
        queue_depth=args.queue_depth,
        mesh=mesh,
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
