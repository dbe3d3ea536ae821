"""HTTP serving latency benchmark (VERDICT r4 item 6).

Measures `POST /api/v1/query` p50/p99 through the real server
(`legal_rag_tpu/server/app.py`) under 1 / 16 / 64 concurrent clients,
with and without the request coalescer, mirroring the reference's
per-request latency logging hook (reference src/server/app.py:143-144)
— but with numbers the reference never published.

Each client holds ONE keep-alive connection and issues sequential
requests (closed-loop), so concurrency == in-flight requests. Mixed
query forms (procedural / victim / informational) exercise the
classifier, concept expansion, CE rerank, and responder.

Usage:
  python scripts/bench_http.py [--store DIR] [--port 8123]
      [--requests 40] [--concurrency 1,16,64] [--no-coalesce-pass]
      [--report PATH]

The server is started as a subprocess (inheriting JAX_PLATFORMS etc.),
polled on /health until ready, load-tested, then killed by pid —
never by pattern.
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "What is the procedure to file an FIR electronically?",
    "I was robbed at gunpoint just now, what do I do?",
    "What is the punishment for robbery under BNS?",
    "How much compensation can an acid attack victim get?",
    "What is a Zero FIR?",
    "Someone threw a corrosive liquid at my cousin's face",
    "Is rape a bailable offence?",
    "Which sections of BNSS deal with medical examination of victims?",
]


def wait_ready(port: int, timeout_s: float = 600.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
            conn.request("GET", "/health")
            resp = conn.getresponse()
            body = json.loads(resp.read())
            conn.close()
            if body.get("engine_status") == "ready":
                return
        except Exception:  # noqa: BLE001 — server still booting
            pass
        time.sleep(2)
    raise TimeoutError(f"server not ready after {timeout_s}s")


def client_loop(port: int, n: int, offset: int, out: list,
                errors: list) -> None:
    """Sequential requests on one keep-alive connection. Failures
    (timeouts at saturation, non-200s) are COUNTED, not raised — a
    stack that can't sustain the level should report that as data."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=180)
    for i in range(n):
        q = QUERIES[(offset + i) % len(QUERIES)]
        body = json.dumps({"query": q}).encode()
        t0 = time.perf_counter()
        try:
            conn.request(
                "POST", "/api/v1/query", body,
                {"Content-Type": "application/json"},
            )
            resp = conn.getresponse()
            data = resp.read()
            if resp.status != 200:
                errors.append(f"{resp.status}: {data[:120]!r}")
                continue
            out.append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — saturation timeouts
            errors.append(f"{type(e).__name__}: {e}")
            conn.close()
            conn = http.client.HTTPConnection(
                "127.0.0.1", port, timeout=180
            )
    conn.close()


def run_level(port: int, concurrency: int, n_per_client: int) -> dict:
    threads, results = [], []
    errors: list = []
    t0 = time.perf_counter()
    for c in range(concurrency):
        out: list = []
        results.append(out)
        th = threading.Thread(
            target=client_loop,
            args=(port, n_per_client, c * 3, out, errors),
        )
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    lat = sorted(x for out in results for x in out)
    row = {
        "concurrency": concurrency,
        "n_requests": len(lat),
        "n_errors": len(errors),
    }
    if errors:
        row["error_sample"] = errors[0]
    if not lat:
        return row

    def pct(p):
        return lat[min(len(lat) - 1, int(p / 100 * len(lat)))]

    row.update({
        "p50_ms": round(pct(50) * 1e3, 2),
        "p90_ms": round(pct(90) * 1e3, 2),
        "p99_ms": round(pct(99) * 1e3, 2),
        "mean_ms": round(sum(lat) / len(lat) * 1e3, 2),
        "qps": round(len(lat) / wall, 1),
    })
    return row


def start_server(store: str, port: int, no_coalesce: bool,
                 no_rerank: bool = False):
    env = dict(os.environ)
    env["LEGAL_RAG_STORE"] = store
    env["PORT"] = str(port)
    if no_coalesce:
        env["LEGAL_RAG_NO_COALESCE"] = "1"
    else:
        env.pop("LEGAL_RAG_NO_COALESCE", None)
    if no_rerank:
        env["LEGAL_RAG_NO_RERANK"] = "1"
    else:
        env.pop("LEGAL_RAG_NO_RERANK", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "legal_rag_tpu.server.app"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    return proc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/r4_store_base")
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--requests", type=int, default=40,
                    help="requests per client per level")
    ap.add_argument("--concurrency", default="1,16,64")
    ap.add_argument("--no-coalesce-pass", action="store_true",
                    help="additionally measure with coalescing disabled")
    ap.add_argument("--no-rerank-pass", action="store_true",
                    help="additionally measure without the CE stage "
                         "(the reference-equivalent pipeline — its CPU "
                         "stack has no cross-encoder)")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.concurrency.split(",")]

    import jax  # noqa: F401 — record the backend in provenance

    passes = [("coalesced", False, False)]
    if args.no_coalesce_pass:
        passes.append(("uncoalesced", True, False))
    if args.no_rerank_pass:
        passes.append(("no_rerank", False, True))

    report = {"store": args.store, "passes": {}}
    for name, no_coal, no_rr in passes:
        proc = start_server(args.store, args.port, no_coal, no_rr)
        try:
            wait_ready(args.port)
            # warm every query form (and so every jit bucket shape —
            # victim queries expand to a 4-wide batch, informational
            # ones stay single) before timing anything: with few
            # requests per level, un-amortized compiles dominate p50
            run_level(args.port, 1, 2 * len(QUERIES))
            rows = []
            for c in levels:
                row = run_level(args.port, c, args.requests)
                print(f"[{name}] c={c}: p50 {row.get('p50_ms')} ms "
                      f"p99 {row.get('p99_ms')} ms qps {row.get('qps')} "
                      f"errors {row['n_errors']}", flush=True)
                rows.append(row)
            report["passes"][name] = rows
        finally:
            os.killpg(proc.pid, signal.SIGTERM)
            try:
                proc.wait(timeout=20)
            except subprocess.TimeoutExpired:
                os.killpg(proc.pid, signal.SIGKILL)
        time.sleep(2)

    import jax as _jax

    report["provenance"] = {
        "platform": _jax.default_backend(),
        "device_kind": getattr(_jax.devices()[0], "device_kind", "?"),
    }
    print(json.dumps(report))
    if args.report:
        with open(args.report, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
