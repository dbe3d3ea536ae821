"""HTTP server contract tests: tri-state health, 503-while-loading,
query response shape, /rag/source endpoint — exercised over real
sockets against a live server task."""

import asyncio
import json
import socket
import threading
import urllib.request

import pytest

from legal_rag_tpu.server.app import EngineHost, HttpApp, run_server


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _get(port, path):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10
        ) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server_port(legal_engine_module):
    """Server with a pre-built offline engine injected."""
    port = _free_port()
    ready = threading.Event()
    loop_holder = {}

    def run():
        loop = asyncio.new_event_loop()
        loop_holder["loop"] = loop
        ev = asyncio.Event()

        async def notify():
            await ev.wait()
            ready.set()

        loop.create_task(notify())
        try:
            loop.run_until_complete(
                run_server(
                    engine=legal_engine_module, port=port,
                    host="127.0.0.1", ready_event=ev,
                )
            )
        except Exception:
            pass

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(timeout=30), "server failed to start"
    yield port
    loop = loop_holder.get("loop")
    if loop:
        loop.call_soon_threadsafe(loop.stop)


@pytest.fixture(scope="module")
def legal_engine_module(tmp_path_factory):
    from legal_rag_tpu.config import (
        RetrievalConfig, EncoderConfig, ShardingConfig,
    )
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.facade import LegalEngine
    from legal_rag_tpu.server.source_fetcher import set_default_catalog

    cfg = RetrievalConfig(
        encoder=EncoderConfig(
            vocab_size=8000, hidden=32, layers=2, heads=4,
            intermediate=64, max_len=64, encode_batch=512,
        ),
        sharding=ShardingConfig(num_shards=2),
    )
    store = build_index("/root/reference/legal_chunks.json", config=cfg)
    # give the source fetcher real section ids
    from legal_rag_tpu.ingest import parse_corpus

    chunks = []
    for c in parse_corpus("/root/reference/documents"):
        d = c.to_reference_dict()
        d["section_id"] = c.section_id
        chunks.append(d)
    set_default_catalog(chunks)
    return LegalEngine(store=store, config=cfg, use_llm=False)


def test_health_ready(server_port):
    status, body = _get(server_port, "/health")
    assert status == 200
    assert body["status"] == "ok"
    assert body["engine_status"] == "ready"
    assert body["error"] is None


def test_query_roundtrip(server_port):
    status, body = _post(
        server_port, "/api/v1/query",
        {"query": "I was robbed at gunpoint, what should I do?"},
    )
    assert status == 200
    assert len(body["answer"]) >= 10
    assert body["safety_alert"]
    assert body["immediate_action_plan"]
    assert body["sources"] and body["sources"][0]["citation"]
    assert body["metadata"]["user_context"] == "victim_distress"
    # API clients of a legal-advice service must see the non-advisory
    # disclaimer (ADVICE r1: the reference's response model drops it)
    assert body["disclaimer"]
    # stage metrics now visible in health
    status, health = _get(server_port, "/health")
    assert "device_search" in health["stage_latency"]


def test_query_validation_errors(server_port):
    status, body = _post(server_port, "/api/v1/query", {})
    assert status == 422
    status, _ = _post(server_port, "/api/v1/query", {"query": 42})
    assert status == 422


def test_unknown_route_404(server_port):
    status, _ = _get(server_port, "/nope")
    assert status == 404


def test_source_endpoint(server_port):
    status, body = _get(
        server_port,
        "/rag/source?source_type=bnss&section_id=Section%20183",
    )
    assert status == 200
    assert "183" in body["section_id"]
    assert len(body["content"]) > 0
    status, _ = _get(
        server_port, "/rag/source?source_type=bogus&section_id=1"
    )
    assert status == 422
    status, _ = _get(
        server_port, "/rag/source?source_type=bnss&section_id=99999"
    )
    assert status == 404


def test_engine_host_tri_state():
    host = EngineHost(store_dir="/nonexistent/path")
    assert host.status == "loading"
    host._load()  # synchronous load against a bad path
    assert host.status == "error"
    assert host.error


def test_503_while_loading():
    """Query against a still-loading host returns 503 with the
    reference's message (app.py:111-114 contract)."""
    host = EngineHost(store_dir=None)
    app = HttpApp(host)
    status, body = asyncio.run(
        app.handle("POST", "/api/v1/query", {}, b'{"query": "x"}')
    )
    assert status == 503
    assert "loading" in body["detail"].lower()


def test_streaming_query(server_port):
    """stream=true yields staged SSE events: intent, context, response
    — the capability the reference's stream flag never delivered."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server_port, timeout=60)
    conn.request(
        "POST", "/api/v1/query",
        body=json.dumps({
            "query": "I was robbed just now, what do I do?",
            "stream": True,
        }),
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    raw = resp.read().decode()
    conn.close()

    events = {}
    for block in raw.strip().split("\n\n"):
        lines = dict(
            line.split(": ", 1) for line in block.splitlines() if ": " in line
        )
        if "event" in lines:
            events[lines["event"]] = json.loads(lines["data"])
    assert set(events) >= {"intent", "context", "response"}
    assert events["intent"]["user_context"] == "victim_distress"
    assert events["context"] and events["context"][0]["citation"]
    assert events["response"]["safety_alert"]
    # ordering: intent before response
    assert raw.index("event: intent") < raw.index("event: response")


def test_fusion_mode_api(server_port):
    status, body = _post(
        server_port, "/api/v1/query",
        {"query": "How much compensation for an acid attack victim?",
         "fusion_mode": "rrf"},
    )
    assert status == 200 and body["answer"]
    status, body = _post(
        server_port, "/api/v1/query",
        {"query": "x", "fusion_mode": "bogus"},
    )
    assert status == 422


def test_oversized_body_rejected(server_port):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server_port, timeout=30)
    big = json.dumps({"query": "x" * (2 << 20)})
    conn.request("POST", "/api/v1/query", body=big,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_streaming_respects_fusion_mode(server_port):
    import http.client

    # invalid mode with stream=true must 422, not stream a 200
    conn = http.client.HTTPConnection("127.0.0.1", server_port, timeout=30)
    conn.request(
        "POST", "/api/v1/query",
        body=json.dumps({"query": "x", "stream": True,
                         "fusion_mode": "bogus"}),
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    assert resp.status == 422
    conn.close()


def test_batch_search_endpoint(server_port):
    status, body = _post(
        server_port, "/api/v1/batch_search",
        {"queries": ["punishment for robbery", "zero fir procedure",
                     "victim compensation"], "k": 3, "fusion_mode": "rrf"},
    )
    assert status == 200
    assert len(body["results"]) == 3
    for rows in body["results"]:
        assert len(rows) == 3
        assert all("citation" in r and "doc_id" in r for r in rows)
    # validation
    assert _post(server_port, "/api/v1/batch_search", {"queries": []})[0] == 422
    assert _post(server_port, "/api/v1/batch_search",
                 {"queries": ["x"], "k": 0})[0] == 422
    assert _post(server_port, "/api/v1/batch_search",
                 {"queries": ["x"] * 257})[0] == 422
    # late-interaction modes 422 with a rebuild hint on a store
    # without multi-vector artifacts (this fixture store has none)
    status, body = _post(
        server_port, "/api/v1/batch_search",
        {"queries": ["x"], "fusion_mode": "maxsim-rerank"},
    )
    assert status == 422 and "multi-vector" in body["detail"]
    assert _post(server_port, "/api/v1/batch_search",
                 {"queries": ["x"], "fusion_mode": "bogus"})[0] == 422


def test_concurrent_queries_and_health(server_port):
    """Parallel queries all succeed and /health stays responsive
    mid-flight (the reference serializes on its event loop)."""
    import concurrent.futures

    queries = [
        "what is the punishment for robbery",
        "zero fir procedure",
        "victim compensation for acid attack",
        "medical examination of victims",
        "I was robbed just now, help",
        "what is section 173 bnss",
    ]
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        futures = [
            pool.submit(_post, server_port, "/api/v1/query", {"query": q})
            for q in queries
        ]
        health_status, health = _get(server_port, "/health")
        results = [f.result(timeout=120) for f in futures]
    assert health_status == 200 and health["engine_status"] == "ready"
    assert all(status == 200 for status, _ in results)
    assert all(body["answer"] for _, body in results)

def test_keep_alive_connection_reuse(server_port):
    """Two requests ride ONE persistent connection (HTTP/1.1
    keep-alive; the round-1 server closed every connection)."""
    s = socket.create_connection(("127.0.0.1", server_port), timeout=10)
    try:
        for _ in range(2):
            s.sendall(
                b"GET /health HTTP/1.1\r\nHost: x\r\n\r\n"
            )
            buf = b""
            while b"\r\n\r\n" not in buf:
                buf += s.recv(4096)
            head, _, rest = buf.partition(b"\r\n\r\n")
            assert b"200" in head.split(b"\r\n")[0]
            assert b"connection: keep-alive" in head.lower()
            length = int(
                [l for l in head.lower().split(b"\r\n")
                 if l.startswith(b"content-length")][0].split(b":")[1]
            )
            while len(rest) < length:
                rest += s.recv(4096)
            json.loads(rest[:length])
    finally:
        s.close()


def test_connection_close_honored(server_port):
    """'Connection: close' requests terminate the socket after the
    response."""
    s = socket.create_connection(("127.0.0.1", server_port), timeout=10)
    try:
        s.sendall(
            b"GET /health HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n"
        )
        buf = b""
        while True:
            got = s.recv(4096)
            if not got:
                break
            buf += got
        head = buf.split(b"\r\n\r\n")[0].lower()
        assert b"connection: close" in head
    finally:
        s.close()


def test_concurrent_queries_coalesce_device_dispatches(
    server_port, legal_engine_module
):
    """N concurrent /query requests must execute FEWER than N device
    dispatches: the serving edge coalesces their searches into shared
    device programs (VERDICT r1 item 6)."""
    import concurrent.futures

    core = legal_engine_module.engine
    coal = core.enable_request_coalescing(window_s=0.05)
    try:
        queries = [
            "punishment for robbery",
            "zero fir registration",
            "acid attack compensation",
            "medical examination procedure",
            "witness examination by police",
            "complaint against public servant",
            "electronic communication fir",
            "non cognizable offence report",
        ]
        before = getattr(core, "device_dispatches", 0)
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            futures = [
                pool.submit(
                    _post, server_port, "/api/v1/query", {"query": q}
                )
                for q in queries
            ]
            results = [f.result(timeout=180) for f in futures]
        assert all(status == 200 for status, _ in results)
        assert all(body["answer"] for _, body in results)
        # every request went through the coalescer, and it needed
        # fewer device programs than requests
        assert coal.requests >= len(queries)
        n_dispatches = core.device_dispatches - before
        assert n_dispatches < len(queries), (
            f"{n_dispatches} dispatches for {len(queries)} concurrent "
            "queries — no coalescing happened"
        )
        # coalescing visible in /health
        _, health = _get(server_port, "/health")
        assert health["coalescing"]["requests"] >= len(queries)
    finally:
        core._coalescer = None


def test_coalescer_results_match_uncoalesced(legal_engine_module):
    """Coalesced search results are identical to direct calls."""
    core = legal_engine_module.engine
    import concurrent.futures

    queries = ["punishment for robbery", "zero fir", "acid attack victim"]
    direct = [core.search_batch([q], k=4) for q in queries]
    core.enable_request_coalescing(window_s=0.05)
    try:
        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
            futures = [
                pool.submit(core.search_batch, [q], 4) for q in queries
            ]
            merged = [f.result(timeout=120) for f in futures]
    finally:
        core._coalescer = None
    for d, m in zip(direct, merged):
        assert [r.doc_id for r in d[0]] == [r.doc_id for r in m[0]]
        assert [r.score for r in d[0]] == pytest.approx(
            [r.score for r in m[0]]
        )


def test_engine_host_config_plumb(monkeypatch):
    """serve --dense-dtype / LEGAL_RAG_DENSE_DTYPE: the config override
    must reach LegalEngine so the chosen storage tier (e.g. pq) is what
    actually serves."""
    import dataclasses

    from legal_rag_tpu.config import DEFAULT_CONFIG
    from legal_rag_tpu.retrieval import facade as facade_mod

    captured = {}

    class FakeInner:
        class store:
            chunks = []

        def enable_request_coalescing(self):
            return object()

    class FakeEngine:
        def __init__(self, store_dir=None, config=None, **kw):
            captured["config"] = config
            self.engine = FakeInner()

        def query(self, *a, **kw):
            return {}

    monkeypatch.setattr(facade_mod, "LegalEngine", FakeEngine)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        dense=dataclasses.replace(DEFAULT_CONFIG.dense, dtype="pq"),
    )
    host = EngineHost(store_dir="/tmp/whatever", config=cfg)
    host._load()
    assert host.status == "ready"
    assert captured["config"].dense.dtype == "pq"

    # default path: no override object constructed
    captured.clear()
    host2 = EngineHost(store_dir="/tmp/whatever")
    host2._load()
    assert "config" not in captured or captured["config"] is None


def test_batch_search_maxsim_rerank_quantized_tier_is_422():
    """maxsim-rerank on a store WITH multi-vector artifacts but a
    quantized (int8/pq) dense tier must 422 at validation — the engine
    would raise (rerank_search needs a float candidate stage) and the
    handler would otherwise surface that as a 500."""
    import asyncio
    import dataclasses
    import json as _json

    from legal_rag_tpu.config import DEFAULT_CONFIG, DenseConfig
    from legal_rag_tpu.server.app import EngineHost, HttpApp

    class _Store:
        mv_tokens = object()      # present

    class _Core:
        config = dataclasses.replace(
            DEFAULT_CONFIG, dense=DenseConfig(dtype="pq")
        )
        store = _Store()

    class _LegalEngine:
        engine = _Core()

    app = HttpApp(EngineHost(engine=_LegalEngine()))
    status, body = asyncio.run(
        app._batch_search(_json.dumps(
            {"queries": ["x"], "fusion_mode": "maxsim-rerank"}
        ).encode())
    )
    assert status == 422
    assert "maxsim-rerank" in body["detail"] and "pq" in body["detail"]
