"""Serving loop: on-device chunked generation + double-buffered drain."""

import json

import numpy as np

from dcvgan_tpu import prng
from dcvgan_tpu.cli.serve import Sink, make_chunk_fn, serve
from dcvgan_tpu.config import ExperimentConfig
from dcvgan_tpu.train.step import DCVGAN


def tiny_gan():
    cfg = ExperimentConfig.from_dict(
        {
            "batchsize": 2,
            "video_length": 16,
            "image_size": 64,
            "geometric_info": {"name": "depth", "channel": 1},
            "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
            "cgen": {"dim_z_color": 4, "ngf": 8},
            "idis": {"use_noise": True, "noise_sigma": 0.1, "ndf": 8},
            "vdis": {"use_noise": False, "ndf": 8},
            "gdis": {"use_noise": False, "ndf": 8},
            "trainer": {"precision": "float32"},
        }
    )
    cfg.validate()
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))
    return cfg, gan, state


def test_chunk_fn_shapes_and_determinism():
    _, gan, state = tiny_gan()
    chunk_fn = make_chunk_fn(gan, batchsize=2, iters=3)
    key = prng.base_key(0)
    csum, xg, xc = chunk_fn(state, key)
    assert xc.shape == (3, 2, 16, 64, 64, 3) and xc.dtype == np.uint8
    assert xg.shape == (3, 2, 16, 64, 64, 1) and xg.dtype == np.uint8
    # per-iteration keys differ -> videos differ across scan iterations
    # (checked pre-quantization: a fresh tiny init generates near-zero
    # pixels that can quantize to the same uint8)
    import jax

    f0 = gan.sample_videos(state, jax.random.fold_in(key, 0), 2)
    f1 = gan.sample_videos(state, jax.random.fold_in(key, 1), 2)
    assert not np.allclose(np.asarray(f0[1]), np.asarray(f1[1]))
    # same key -> identical chunk (serving is replayable)
    csum2, _, xc2 = chunk_fn(state, key)
    assert int(csum) == int(csum2)
    assert np.array_equal(np.asarray(xc), np.asarray(xc2))


def test_serve_null_sink():
    _, gan, state = tiny_gan()
    sink = Sink("null", None, "depth", with_geo=False)
    stats = serve(gan, state, batchsize=2, iters_per_chunk=2, chunks=3, sink=sink)
    assert stats["videos"] == 12
    assert stats["value"] > 0
    assert stats["delivered_videos_per_sec"] is None
    json.dumps(stats)  # JSON-serializable record


def test_serve_npy_sink(tmp_path):
    _, gan, state = tiny_gan()
    out = tmp_path / "shards"
    sink = Sink("npy", out, "depth", with_geo=True)
    stats = serve(gan, state, batchsize=2, iters_per_chunk=2, chunks=2, sink=sink)
    color = sorted(out.glob("color_*.npy"))
    geo = sorted(out.glob("geo_*.npy"))
    assert len(color) == 2 and len(geo) == 2
    arr = np.load(color[0])
    assert arr.shape == (2, 2, 16, 64, 64, 3) and arr.dtype == np.uint8
    assert arr.min() >= 0 and arr.max() <= 255
    assert stats["delivered_MB_per_sec"] is not None


def test_http_endpoint():
    import io
    import threading
    import urllib.request

    from dcvgan_tpu.cli.serve import GenerationServer, serve_http

    _, gan, state = tiny_gan()
    gen = GenerationServer(gan, state, batchsize=2, iters_per_chunk=1)
    httpd = serve_http(gen, 0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"

        with urllib.request.urlopen(f"{base}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["batchsize"] == 2

        # 3 videos from a 2-per-chunk server -> pipelined 2-chunk request
        with urllib.request.urlopen(f"{base}/generate?n=3&seed=7") as r:
            assert r.headers["Content-Type"] == "application/x-npy"
            body1 = r.read()
        vids = np.load(io.BytesIO(body1))
        assert vids.shape == (3, 16, 64, 64, 3) and vids.dtype == np.uint8

        # same seed -> identical bytes (replayable serving)
        with urllib.request.urlopen(f"{base}/generate?n=3&seed=7") as r:
            assert r.read() == body1

        # geo=1 -> npz with both modalities
        with urllib.request.urlopen(f"{base}/generate?n=2&seed=0&geo=1") as r:
            npz = np.load(io.BytesIO(r.read()))
        assert npz["color"].shape == (2, 16, 64, 64, 3)
        assert npz["geo"].shape == (2, 16, 64, 64, 1)

        # bad input -> 400, server keeps serving
        try:
            urllib.request.urlopen(f"{base}/generate?n=0")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        with urllib.request.urlopen(f"{base}/stats") as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 3 and stats["videos_served"] == 8
        assert stats["errors"] == 1
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_hardening():
    """POST JSON semantics, exact streamed-npy framing, 413 caps, 429
    admission control, and behavior under concurrent requests."""
    import io
    import threading
    import urllib.error
    import urllib.request

    from dcvgan_tpu.cli.serve import GenerationServer, serve_http

    _, gan, state = tiny_gan()
    gen = GenerationServer(
        gan, state, batchsize=2, iters_per_chunk=1,
        max_request_videos=8, max_concurrent=2,
    )
    httpd = serve_http(gen, 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def get(url):
        with urllib.request.urlopen(url) as r:
            return r.read()

    def expect_code(req_or_url, code):
        try:
            urllib.request.urlopen(req_or_url)
            raise AssertionError(f"expected HTTP {code}")
        except urllib.error.HTTPError as e:
            assert e.code == code, f"expected {code}, got {e.code}"
            return e

    try:
        # POST with a JSON body returns byte-identical output to the GET form
        body_get = get(f"{base}/generate?n=3&seed=7")
        req = urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"n": 3, "seed": 7, "geo": False}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert r.read() == body_get

        # the hand-framed streaming response is exactly np.save's format
        vids = np.load(io.BytesIO(body_get))
        buf = io.BytesIO()
        np.save(buf, vids)
        assert buf.getvalue() == body_get

        # malformed JSON body -> 400
        bad = urllib.request.Request(
            f"{base}/generate", data=b"{not json", method="POST"
        )
        expect_code(bad, 400)

        # negative Content-Length -> immediate 400, never a blocking
        # read-to-EOF that would pin the handler thread
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        try:
            conn.putrequest("POST", "/generate")
            conn.putheader("Content-Length", "-1")
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400, resp.status
        finally:
            conn.close()

        # over the videos cap -> 413 with the limit in the body
        err = expect_code(f"{base}/generate?n=9", 413)
        assert json.loads(err.read())["max_request_videos"] == 8
        # geo responses are buffered -> half the cap
        expect_code(f"{base}/generate?n=5&geo=1", 413)

        # both admission slots taken -> 429 with Retry-After
        assert gen.admit() and gen.admit()
        try:
            err = expect_code(f"{base}/generate?n=2", 429)
            assert err.headers["Retry-After"] == "1"
        finally:
            gen.release()
            gen.release()

        # concurrent burst: every response is 200 or 429, never a crash,
        # and the server still serves afterwards
        codes = []
        lock = threading.Lock()

        def fire():
            try:
                with urllib.request.urlopen(f"{base}/generate?n=2") as r:
                    code = r.status
            except urllib.error.HTTPError as e:
                code = e.code
            with lock:
                codes.append(code)

        threads = [threading.Thread(target=fire) for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert set(codes) <= {200, 429} and 200 in codes
        assert np.load(io.BytesIO(get(f"{base}/generate?n=1"))).shape[0] == 1
        with urllib.request.urlopen(f"{base}/stats") as r:
            stats = json.loads(r.read())
        assert stats["rejected"] >= 2  # the two 413s at minimum
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_mesh_sharded_chunk_matches_unsharded():
    """SPMD serving: sharding the chunk batch over the 8-device mesh yields
    bit-identical videos to the single-device chunk (partitionable threefry
    + deterministic convs), so multi-chip serving is a pure throughput play."""
    import jax

    from dcvgan_tpu.parallel.mesh import create_mesh, replicate

    _, gan, state = tiny_gan()
    key = prng.base_key(11)
    ref_csum, ref_xg, ref_xc = make_chunk_fn(gan, batchsize=8, iters=2)(
        state, key
    )

    mesh = create_mesh(data=8, batchsize=8)
    assert mesh.size == 8
    sharded_fn = make_chunk_fn(gan, batchsize=8, iters=2, mesh=mesh)
    csum, xg, xc = sharded_fn(replicate(state, mesh), key)
    # outputs are laid out across all 8 devices on the batch axis
    assert len(xc.sharding.device_set) == 8
    assert int(csum) == int(ref_csum)
    np.testing.assert_array_equal(np.asarray(xc), np.asarray(ref_xc))
    np.testing.assert_array_equal(np.asarray(xg), np.asarray(ref_xg))


def test_serve_with_mesh(tmp_path):
    """End-to-end serve() over a 4-device mesh reports mesh-size chips."""
    from dcvgan_tpu.parallel.mesh import create_mesh

    _, gan, state = tiny_gan()
    mesh = create_mesh(data=4, batchsize=4)
    stats = serve(
        gan, state, batchsize=4, iters_per_chunk=1, chunks=2,
        sink=Sink("null", None, "depth", False), mesh=mesh,
    )
    assert stats["n_chips"] == 4
    assert stats["videos"] == 8


def test_serve_mp4_sink(tmp_path):
    cfg, gan, state = tiny_gan()
    out = tmp_path / "served"
    sink = Sink("mp4", out, "depth", with_geo=True)
    serve(gan, state, batchsize=2, iters_per_chunk=1, chunks=2, sink=sink)
    color = sorted((out / "color").glob("*.mp4"))
    geo = sorted((out / "depth").glob("*.mp4"))
    assert len(color) == 4 and len(geo) == 4  # 2 chunks x 1 iter x batch 2

    from dcvgan_tpu.io.video import read_video

    v = read_video(color[0])
    assert v.shape == (16, 64, 64, 3)


def test_micro_batching_coalesces():
    """Concurrent unseeded requests share device chunks: 6 requests x 2
    videos at 8 videos/chunk cost ~2 dispatches, not 6 (continuous-batching
    semantics; no reference analogue — it has no serving path)."""
    import threading

    from dcvgan_tpu.cli.serve import GenerationServer

    _, gan, state = tiny_gan()
    gen = GenerationServer(
        gan, state, batchsize=4, iters_per_chunk=2,
        max_concurrent=16, batch_window_ms=300.0,
    )
    try:
        results = [None] * 6

        def run(i):
            got = [c for _, c in gen.batcher.submit(2)]
            results[i] = np.concatenate(got)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for r in results:
            assert r is not None
            assert r.shape == (2, 16, 64, 64, 3) and r.dtype == np.uint8
        # 12 videos at 8/chunk = 2 chunks fully coalesced; slack for
        # stragglers that miss the first window under slow CI scheduling
        assert gen.counters["batched_chunks"] <= 4
        assert gen.counters["batched_requests"] == 6
        assert gen.counters["videos_served"] == 12

        # geometry through the batched path: both modalities, exact n
        got = list(gen.batcher.submit(3, with_geo=True))
        geo = np.concatenate([g for g, _ in got])
        color = np.concatenate([c for _, c in got])
        assert geo.shape == (3, 16, 64, 64, 1)
        assert color.shape == (3, 16, 64, 64, 3)
    finally:
        gen.close()


def test_http_unseeded_requests_use_batcher():
    """seed omitted -> server-picked stream: responses advance (two calls
    differ at the stream level) and the batched-chunk counter moves, while
    explicit seeds stay on the deterministic dedicated path."""
    import io
    import threading
    import urllib.request

    from dcvgan_tpu.cli.serve import GenerationServer, serve_http

    _, gan, state = tiny_gan()
    gen = GenerationServer(gan, state, batchsize=2, iters_per_chunk=1,
                           batch_window_ms=1.0)
    httpd = serve_http(gen, 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/generate?n=2") as r:
            a = r.read()
        with urllib.request.urlopen(f"{base}/generate?n=2&seed=auto") as r:
            b = r.read()
        assert np.load(io.BytesIO(a)).shape == (2, 16, 64, 64, 3)
        assert np.load(io.BytesIO(b)).shape == (2, 16, 64, 64, 3)
        # the client can finish reading the body a hair before the server
        # thread's post-stream accounting runs; give counters a beat
        import time as _time

        deadline = _time.time() + 5
        while (_time.time() < deadline
               and gen.counters["batched_requests"] < 2):
            _time.sleep(0.01)
        assert gen.counters["batched_chunks"] >= 2
        assert gen.counters["batched_requests"] == 2
        # explicit seed still replayable alongside batched traffic
        with urllib.request.urlopen(f"{base}/generate?n=2&seed=11") as r:
            s1 = r.read()
        with urllib.request.urlopen(f"{base}/generate?n=2&seed=11") as r:
            assert r.read() == s1
    finally:
        httpd.shutdown()
        httpd.server_close()
        gen.close()


def test_micro_batch_failure_only_hits_its_own_chunk():
    """A failed chunk fails exactly the requests it was dispatched for;
    arrivals during its execution stay queued and are served by the next
    chunk (regression: the except path used to clear the whole queue)."""
    import threading
    import time

    from dcvgan_tpu.cli.serve import GenerationServer

    _, gan, state = tiny_gan()
    gen = GenerationServer(
        gan, state, batchsize=4, iters_per_chunk=1,
        max_concurrent=16, batch_window_ms=1.0,
    )
    try:
        real_fn = gen.chunk_fn
        b_joined = threading.Event()
        fail_armed = threading.Event()
        fail_armed.set()

        def flaky(state_, key):
            if fail_armed.is_set():
                fail_armed.clear()
                b_joined.wait(timeout=60)  # let B join the queue mid-chunk
                raise RuntimeError("transient device error")
            return real_fn(state_, key)

        gen.chunk_fn = flaky

        a_err, b_out = [], []

        def run_a():
            try:
                list(gen.batcher.submit(2))
            except RuntimeError as e:
                a_err.append(e)

        ta = threading.Thread(target=run_a)
        ta.start()
        # wait until A's chunk is in flight (its request snapshot is taken)
        for _ in range(1000):
            if not fail_armed.is_set():
                break
            time.sleep(0.01)
        assert not fail_armed.is_set(), "A's chunk never dispatched"

        def run_b():
            got = [c for _, c in gen.batcher.submit(2)]
            b_out.append(np.concatenate(got))

        tb = threading.Thread(target=run_b)
        tb.start()
        for _ in range(1000):  # B visible in the queue before the failure
            with gen.batcher._cv:
                if gen.batcher._live():
                    break
            time.sleep(0.01)
        b_joined.set()

        ta.join(timeout=120)
        tb.join(timeout=120)
        assert a_err, "request A must see its chunk's failure"
        assert b_out and b_out[0].shape == (2, 16, 64, 64, 3)
        assert gen.counters["errors"] == 1
    finally:
        gen.close()
