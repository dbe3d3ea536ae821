"""Benchmark harness: batched hybrid retrieval QPS/chip on the real
corpus vs the CPU baseline.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Details (per-stage timings, config, p50 latency) go to stderr.

Baseline: the reference stack is FAISS IndexFlatIP + rank_bm25 on CPU
(reference retrieval_engine.py:59-96). Neither wheel is installed here,
so the baseline is the same math run the same way a CPU engine runs it:
BLAS sgemm for exact dense scores + argpartition top-k, np.add.at
postings scatter for BM25, vectorized fusion. This is *faster* than
rank_bm25's per-term masked ops, so the comparison is conservative.

Measured op: the full hybrid search core for a Q-query batch — dense
top-2k + full-corpus BM25 + weighted fusion + top-k — queries already
embedded (both sides), postings already gathered (both sides). Encode
throughput is reported separately to stderr.

Measurement discipline (learned the hard way across rounds 1-2):
the shared TPU relay has a bimodal per-dispatch latency (healthy
~0.03 ms, degraded 8-40 ms after any big compile) and its
block_until_ready can return early for pure-XLA programs, so naive
wall timing lies in both directions. The number of record is pure
device time by the SLOPE METHOD: run the search r times inside ONE
jitted fori_loop, host-fetch to sync, and take
(t(r2) - t(r1)) / (r2 - r1) — constant relay overhead cancels exactly.
Round-2 postmortem (VERDICT.md): the global alarm fired inside the
slope's compile and a broad `except Exception` swallowed the one-shot
BenchDeadline, un-deadlining the run and letting degraded-relay wall
timing become the headline (0.59x). Hence the structure below:
BenchDeadline is a BaseException no broad except can eat, every phase
re-arms its own sub-deadline, slope programs compile during setup
(and persist in the on-disk XLA compile cache), and the batch slope is
retried late in the run if it failed early — a successful slope
anywhere in the run is always the headline.
"""

import json
import os
import signal
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

Q_BATCH = 64
K = 5
REPEATS = 30


def log(*args):
    print(*args, file=sys.stderr, flush=True)


class BenchDeadline(BaseException):
    """Phase deadline. BaseException so `except Exception` guards inside
    measurement code cannot swallow it (round-2 bug)."""


_DEADLINE_T0 = time.monotonic()
_TOTAL_BUDGET = int(os.environ.get("BENCH_DEADLINE_S", "480"))


def _remaining() -> float:
    return _TOTAL_BUDGET - (time.monotonic() - _DEADLINE_T0)


def _arm(seconds: float) -> None:
    """(Re-)arm the alarm for this phase, capped by the global budget."""
    seconds = max(1, min(int(seconds), int(max(_remaining(), 1))))
    signal.alarm(seconds)


def _disarm() -> None:
    signal.alarm(0)


def _install_handler() -> None:
    def _raise(signum, frame):
        raise BenchDeadline()

    signal.signal(signal.SIGALRM, _raise)


def build_store():
    from legal_rag_tpu.config import RetrievalConfig
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.index.store import VectorStore

    cfg = RetrievalConfig()
    cache = os.path.join(REPO, ".bench_cache", "store")
    if os.path.exists(os.path.join(cache, "manifest.json")):
        try:
            store = VectorStore.load(cache)
            log(f"index loaded from cache: n={store.n_docs} dim={store.dim}")
            return store, cfg
        except Exception as e:  # noqa: BLE001
            log(f"cache load failed ({e}); rebuilding")
    src = os.path.join("/root/reference", "legal_chunks.json")
    t0 = time.time()
    store = build_index(src, config=cfg, store_dir=cache)
    log(f"index built: n={store.n_docs} dim={store.dim} "
        f"({time.time() - t0:.1f}s)")
    return store, cfg


def sample_queries(store, n, seed=0):
    """Realistic keyword-bearing queries drawn from corpus vocabulary."""
    rng = np.random.default_rng(seed)
    texts = [c["text"] for c in store.chunks]
    out = []
    for _ in range(n):
        t = texts[rng.integers(len(texts))]
        words = [w for w in t.split() if w.isalpha()]
        take = rng.integers(3, 9)
        if len(words) >= take:
            lo = rng.integers(0, len(words) - take + 1)
            out.append(" ".join(words[lo : lo + take]))
        else:
            out.append("punishment for robbery under section")
    return out


def cpu_baseline(store, q_emb, post_ids, post_w, weights, k):
    """FAISS-flat + rank_bm25-equivalent CPU hybrid search."""
    docs = store.embeddings
    n = store.n_docs
    c = 2 * k

    def run():
        dense = q_emb @ docs.T                                   # sgemm
        # partial-select then stable sort with ascending-id tie-break
        # (exact ties are common — duplicate chunk texts — and FAISS's
        # heap also resolves them to the lowest id)
        part = np.argpartition(-dense, c - 1, axis=1)[:, : 4 * c]
        part.sort(axis=1)  # ascending ids so the stable sort ties by id
        part_s = np.take_along_axis(dense, part, axis=1)
        order = np.argsort(-part_s, axis=1, kind="stable")[:, :c]
        cand = np.take_along_axis(part, order, axis=1)
        cand_s = np.take_along_axis(part_s, order, axis=1)

        bm = np.zeros((q_emb.shape[0], n), dtype=np.float32)
        for qi in range(q_emb.shape[0]):
            valid = post_ids[qi] < n
            np.add.at(bm[qi], post_ids[qi][valid], post_w[qi][valid])
        mx = bm.max(axis=1, keepdims=True)
        mx[mx <= 0] = 1.0
        bmn = bm / mx
        cand_bm = np.take_along_axis(bmn, cand, axis=1)
        fused = cand_s * (1 - weights[:, None]) + cand_bm * weights[:, None]
        forder = np.argsort(-fused, axis=1, kind="stable")[:, :k]
        return (
            np.take_along_axis(fused, forder, axis=1),
            np.take_along_axis(cand, forder, axis=1),
        )

    run()  # warmup
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        f, ids = run()
    dt = (time.perf_counter() - t0) / REPEATS
    return f, ids, dt


def main(metrics):
    import jax
    import jax.numpy as jnp

    from legal_rag_tpu.parallel.mesh import make_mesh
    from legal_rag_tpu.parallel.sharded import (
        ShardedIndex, sharded_hybrid_search,
    )

    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()} (platform={platform})")

    # ---- PHASE: setup + all compiles + the batch slope (the headline).
    # Budget: nearly the whole run — the slope program's *remote*
    # compile is the long pole (98-330 s observed; the relay does not
    # hit the local persistent cache) and the slope measurement itself
    # takes ~2 s, so the headline is banked the moment compile lands.
    # A deadline here means the relay compile path is wedged; the
    # top-level handler emits whatever is banked. Reserve 120 s so the
    # late phases (wall fallback + slope compile RETRY — an interrupted
    # remote compile usually completes server-side, so the retry hits
    # the relay cache) still run after a compile deadline.
    _arm(_remaining() - 120)

    store, cfg = build_store()
    queries = sample_queries(store, Q_BATCH)

    # Query embeddings: perturbed corpus embeddings (unit vectors with a
    # realistic similarity structure). The encoder itself is benched
    # separately AFTER the search measurement — its multi-minute remote
    # compile on this setup degrades subsequent dispatch latencies and
    # must not contaminate the search numbers.
    rng = np.random.default_rng(1)
    rows = rng.integers(0, store.n_docs, Q_BATCH)
    q_emb = store.embeddings[rows] + 0.05 * rng.standard_normal(
        (Q_BATCH, store.dim)
    ).astype(np.float32)
    q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)

    budget = max(64, store.bm25.postings_budget(queries))
    budget = 1 << (budget - 1).bit_length()
    post_ids, post_w = store.bm25.gather_postings(queries, budget)
    weights = np.full(Q_BATCH, 0.5, dtype=np.float32)
    log(f"postings budget: {budget}")

    # ---- CPU baseline
    cpu_f, cpu_ids, cpu_dt = cpu_baseline(
        store, q_emb, post_ids, post_w, weights, K
    )
    cpu_qps = Q_BATCH / cpu_dt
    metrics["cpu_qps"] = cpu_qps
    log(f"CPU baseline: {cpu_dt*1e3:.2f} ms/batch -> {cpu_qps:.0f} QPS")

    # ---- device path
    mesh = make_mesh(1)
    index = ShardedIndex.from_embeddings(store.embeddings, mesh)
    d_post_ids = jnp.asarray(post_ids)
    d_post_w = jnp.asarray(post_w)
    d_q = jnp.asarray(q_emb)
    d_w = jnp.asarray(weights)

    def device_run(use_pallas):
        return sharded_hybrid_search(
            index.docs, d_post_ids, d_post_w, d_q, d_w,
            mesh=mesh, k=K, c=2 * K, n_docs=store.n_docs,
            mode="weighted", use_pallas=use_pallas,
        )

    # single-query program (the serving path pads tiny batches to the
    # 8-wide bucket; one executable per pow2 bucket)
    sq = [jnp.asarray(x[:8]) for x in (q_emb, post_ids, post_w)]
    sw = jnp.asarray(weights[:8])

    def single(use_pallas):
        return sharded_hybrid_search(
            index.docs, sq[1], sq[2], sq[0], sw,
            mesh=mesh, k=K, c=2 * K, n_docs=store.n_docs,
            mode="weighted", use_pallas=use_pallas,
        )

    # Pre-compile EVERY serving bucket before any measurement: a fresh
    # remote compile mid-run can flip the relay into its degraded
    # dispatch mode and poison later numbers (VERDICT r1 item 4).
    use_pallas = platform == "tpu"
    try:
        t0 = time.time()
        out = device_run(use_pallas)
        jax.block_until_ready(out)
        jax.block_until_ready(single(use_pallas))
        log(f"search programs compiled ({time.time()-t0:.1f}s)")
    except BenchDeadline:
        raise
    except Exception as e:  # noqa: BLE001
        log(f"pallas path failed ({type(e).__name__}: {e}); XLA fallback")
        use_pallas = False
        out = device_run(use_pallas)
        jax.block_until_ready(out)
        jax.block_until_ready(single(use_pallas))

    # Slope-method loop programs (batch-64 and single-query): compiled
    # NOW, during setup, so (a) the measurement phases below never pay
    # a compile and (b) the executables land in the persistent on-disk
    # XLA compile cache — the next bench run (the driver's) hits cache.
    #
    # Round-4 postmortem (VERDICT r4 weak #1): the previous version
    # CLOSED OVER index.docs / queries / postings, baking every array
    # into the HLO as a giant constant — slow to compile remotely
    # (301 s observed) and cache-key-fragile (the constants change with
    # the store, so the persistent cache never hits). Same bug commit
    # e4b5e30 fixed in bench_maxsim_scale.py. Arrays are now jit
    # ARGUMENTS: the program is small, compiles in seconds, and its
    # cache key is shape-only (stable across runs and corpus rebuilds).
    def loop_program(r, docs, q, pids, pw, w):
        def step(i, acc):
            # the i-dependence stops XLA hoisting the body out of
            # the loop; numerically a no-op (1 + i*1e-30 == 1.0)
            qq = q * (1.0 + i.astype(jnp.float32) * 1e-30)
            f, ids, _, _ = sharded_hybrid_search(
                docs, pids, pw, qq, w,
                mesh=mesh, k=K, c=2 * K, n_docs=store.n_docs,
                mode="weighted", use_pallas=use_pallas,
            )
            return acc + f.sum() + ids.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    loop_fn = jax.jit(loop_program)
    # one executable per batch shape (64-wide and 8-wide buckets)
    loop_jit = lambda r: loop_fn(  # noqa: E731
        r, index.docs, d_q, d_post_ids, d_post_w, d_w)
    sq_jit = lambda r: loop_fn(  # noqa: E731
        r, index.docs, sq[0], sq[1], sq[2], sw)
    slope_compiled = False
    try:
        t0 = time.time()
        float(loop_jit(2))  # compile (dynamic trip count: one executable)
        float(sq_jit(2))
        log(f"slope loop programs compiled ({time.time()-t0:.1f}s)")
        slope_compiled = True
    except BenchDeadline:
        # relay compile wedged: retry the compile FIRST (below) — an
        # interrupted remote compile usually completes server-side, so
        # the retry hits the relay cache and returns in seconds.
        log(f"slope program compile deadlined after {time.time()-t0:.0f}s")

    # Compile retry BEFORE any diagnostics (VERDICT r4: in round 4 the
    # wall+p50 diagnostics burned the budget the retry needed and the
    # run emitted 0.0 with a healthy chip).
    if not slope_compiled and _remaining() > 45:
        try:
            _arm(_remaining() - 30)
            t0 = time.time()
            float(loop_jit(2))
            float(sq_jit(2))
            slope_compiled = True
            log(f"slope compile retry succeeded ({time.time()-t0:.1f}s)")
        except BenchDeadline:
            log("slope compile retry deadlined — wall diagnostics only")
        except Exception as e:  # noqa: BLE001
            log(f"slope compile retry failed: {type(e).__name__}: {e}")

    def measure_slope(fn, r1=64, r2=4096):
        def timed(r):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(r))   # host fetch = true sync
                best = min(best, time.perf_counter() - t0)
            return best

        t_r1, t_r2 = timed(r1), timed(r2)
        dt = (t_r2 - t_r1) / (r2 - r1)
        log(f"slope: t({r1})={t_r1*1e3:.1f} ms t({r2})={t_r2*1e3:.1f} ms"
            f" -> {dt*1e6:.2f} us/iter device")
        return dt if dt > 0 else float("inf")

    # Batch slope: the headline. Re-arm in case the compile retry above
    # consumed the setup budget.
    slope_dt = float("inf")
    if slope_compiled:
        try:
            _arm(min(120, max(_remaining() - 15, 10)))
            slope_dt = measure_slope(loop_jit)
        except BenchDeadline:
            log("batch slope deadlined; will retry after diagnostics")
        except Exception as e:  # noqa: BLE001
            log(f"batch slope failed ({type(e).__name__}: {e}); will retry")
    if slope_dt != float("inf"):
        # bank the headline metric IMMEDIATELY: everything after this
        # point is diagnostics, and a wedged relay mid-diagnostic must
        # not cost the number of record
        metrics["dev_qps"] = Q_BATCH / slope_dt
        metrics["slope_ok"] = True
        log(f"banked dev_qps={metrics['dev_qps']:.0f} (slope method, "
            f"{slope_dt*1e6:.1f} us/batch-64 device)")

    # single-query device latency by the same method
    if slope_compiled:
        try:
            _arm(min(90, max(_remaining() - 15, 10)))
            sq_dt = measure_slope(sq_jit)
            if sq_dt != float("inf"):
                metrics["single_device_ms"] = sq_dt * 1e3
                log(f"single-query device time (slope): {sq_dt*1e6:.1f} us")
        except BenchDeadline:
            log("single-query slope deadlined")
        except Exception as e:  # noqa: BLE001
            log(f"single-query slope failed: {type(e).__name__}: {e}")

    # ---- PHASE: wall-clock diagnostics (sync/pipelined batch, p50).
    # These characterize the relay, not the chip; they never override a
    # banked slope number. Hard sub-budgets (VERDICT r4): diagnostics
    # must never starve a slope measurement or retry of budget.
    trivial = jax.jit(lambda a: a * 2 + 1)
    probe = jnp.ones((8, 128))

    def dispatch_floor():
        jax.block_until_ready(trivial(probe))
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(trivial(probe))
        return (time.perf_counter() - t0) / 10

    best_sync = best_pipe = float("inf")
    try:
        _arm(min(60 if metrics.get("slope_ok") else 45,
                 max(_remaining() - 60, 5)))
        for attempt in range(2):
            floor = dispatch_floor()
            log(f"attempt {attempt}: dispatch floor {floor*1e3:.2f} ms")

            t0 = time.perf_counter()
            for _ in range(REPEATS):
                out = device_run(use_pallas)
                jax.block_until_ready(out)
            best_sync = min(best_sync, (time.perf_counter() - t0) / REPEATS)

            # pipelined throughput (queue depth > 1): dispatch all
            # batches, then host-fetch the LAST result — TPU programs
            # execute in-order, so this is a true sync even on the relay
            # tunnel where bare block_until_ready can return early
            pipe_n = REPEATS * 5
            t0 = time.perf_counter()
            outs = [device_run(use_pallas) for _ in range(pipe_n)]
            np.asarray(outs[-1][0])
            best_pipe = min(best_pipe, (time.perf_counter() - t0) / pipe_n)

            if floor < 1e-3 and best_pipe < 1e-3:
                break  # healthy measurement banked
            if attempt == 0 and _remaining() > 150:
                time.sleep(30)  # let the relay recover before retrying
        log(f"device ({platform}, pallas={use_pallas}): sync "
            f"{best_sync*1e3:.2f} ms/batch, pipelined {best_pipe*1e3:.2f}"
            f" ms/batch (wall diagnostics)")
    except BenchDeadline:
        log("wall diagnostics deadlined (non-fatal)")
    if "dev_qps" not in metrics and min(best_sync, best_pipe) < float("inf"):
        # last-resort fallback only — flagged, and the retry phase below
        # still tries to replace it with a real slope number
        metrics["dev_qps"] = Q_BATCH / min(best_sync, best_pipe)
        log(f"provisional dev_qps={metrics['dev_qps']:.0f} from wall "
            f"timing (slope pending retry)")

    # single-query wall p50 (diagnostic; the relay's degraded dispatch
    # mode is ~8-35 ms/call of tunnel overhead, not compute)
    try:
        _arm(min(60 if metrics.get("slope_ok") else 45,
                 max(_remaining() - 45, 5)))
        best_p50 = best_p90 = float("inf")
        floors = []
        for attempt in range(2):
            floor = dispatch_floor()
            floors.append(floor)
            for _ in range(10):
                jax.block_until_ready(single(use_pallas))
            lat = []
            for _ in range(50):
                t0 = time.perf_counter()
                jax.block_until_ready(single(use_pallas))
                lat.append(time.perf_counter() - t0)
            p50 = float(np.percentile(lat, 50))
            if p50 < best_p50:
                best_p50, best_p90 = p50, float(np.percentile(lat, 90))
            if floor < 1e-3 and best_p50 < 2e-3:
                break
            if attempt == 0 and _remaining() > 150:
                log(f"single-query attempt {attempt}: p50 {p50*1e3:.2f} ms"
                    f" at dispatch floor {floor*1e3:.2f} ms — waiting for"
                    f" the relay to recover")
                time.sleep(30)
        log(f"single-query p50: {best_p50*1e3:.2f} ms "
            f"(p90 {best_p90*1e3:.2f} ms)")
        metrics["single_p50_ms"] = best_p50 * 1e3
        if best_p50 >= 2e-3:
            log(
                f"DIAGNOSTIC: single-query p50 {best_p50*1e3:.2f} ms with "
                f"dispatch floors {[f'{f*1e3:.2f}' for f in floors]} ms "
                f"(healthy ~0.03 ms) — the TPU relay stayed in its "
                f"degraded dispatch mode across all retries; the latency "
                f"is tunnel overhead, not chip compute (device-side "
                f"single-query time by the slope method: "
                f"{metrics.get('single_device_ms', float('nan'))*1e3:.0f}"
                f" us)"
            )
    except BenchDeadline:
        log("p50 diagnostics deadlined (non-fatal)")

    # ---- PHASE: batch slope retry. Round-2 evidence: the relay
    # recovers mid-run (the single-query slope succeeded minutes after
    # the batch slope died), so a failed batch slope MUST be retried —
    # a degraded wall number is never the final headline while a slope
    # can still be measured. (The compile retry itself now happens
    # BEFORE the diagnostics — VERDICT r4; this is a second chance for
    # the compile only if budget still allows.)
    if not slope_compiled and _remaining() > 30:
        try:
            _arm(_remaining() - 15)
            t0 = time.time()
            float(loop_jit(2))
            slope_compiled = True
            log(f"late slope compile retry succeeded ({time.time()-t0:.1f}s)")
        except BenchDeadline:
            log("late slope compile retry deadlined")
        except Exception as e:  # noqa: BLE001
            log(f"late slope compile retry failed: {type(e).__name__}: {e}")
    if slope_compiled and not metrics.get("slope_ok") and _remaining() > 30:
        try:
            _arm(min(90, _remaining() - 15))
            slope_dt = measure_slope(loop_jit)
            if slope_dt != float("inf"):
                metrics["dev_qps"] = Q_BATCH / slope_dt
                metrics["slope_ok"] = True
                log(f"retry banked dev_qps={metrics['dev_qps']:.0f} "
                    f"(slope method)")
        except BenchDeadline:
            log("batch slope retry deadlined")
        except Exception as e:  # noqa: BLE001
            log(f"batch slope retry failed: {type(e).__name__}: {e}")

    # ---- PHASE: correctness + encoder (refinements; headline banked)
    _arm(max(_remaining() - 10, 5))

    # correctness: recall@k vs the exact golden (full stable argsort,
    # score desc / id asc — the math FAISS flat performs)
    dense = q_emb @ store.embeddings.T
    cand = np.argsort(-dense, axis=1, kind="stable")[:, : 2 * K]
    bm = np.zeros((Q_BATCH, store.n_docs), dtype=np.float32)
    for qi in range(Q_BATCH):
        valid = post_ids[qi] < store.n_docs
        np.add.at(bm[qi], post_ids[qi][valid], post_w[qi][valid])
    mx = bm.max(axis=1, keepdims=True)
    mx[mx <= 0] = 1.0
    fused = (
        np.take_along_axis(dense, cand, axis=1) * 0.5
        + np.take_along_axis(bm / mx, cand, axis=1) * 0.5
    )
    gold_ids = np.take_along_axis(
        cand, np.argsort(-fused, axis=1, kind="stable")[:, :K], axis=1
    )
    dev_ids = np.asarray(out[1])
    agree = np.mean([
        len(set(dev_ids[i]) & set(gold_ids[i])) / K for i in range(Q_BATCH)
    ])
    log(f"recall@{K} vs exact golden: {agree:.4f}")
    metrics["recall_at_k"] = float(agree)

    # ---- encoder throughput (after the search numbers: its remote
    # compile takes minutes and degrades later dispatches)
    if os.environ.get("BENCH_SKIP_ENCODE") != "1":
        from legal_rag_tpu.retrieval.engine import RetrievalEngine

        engine = RetrievalEngine(store, config=cfg, mesh=mesh)
        t0 = time.time()
        engine.encoder.encode(queries)
        compile_s = time.time() - t0
        best_enc = float("inf")
        enc_floors = []
        for attempt in range(3):
            enc_floors.append(dispatch_floor())
            t0 = time.time()
            engine.encoder.encode(queries)
            best_enc = min(best_enc, time.time() - t0)
            rate = len(queries) / max(best_enc, 1e-9)
            if rate >= 500:
                break  # the rate is the metric; floor mood irrelevant
            if attempt < 2 and _remaining() > 120:
                log(f"encode attempt {attempt}: {rate:.0f} texts/s at "
                    f"floor {enc_floors[-1]*1e3:.2f} ms — waiting")
                time.sleep(45)
        rate = len(queries) / max(best_enc, 1e-9)
        log(f"encode: first {compile_s:.1f}s (compile), steady "
            f"{best_enc:.2f}s ({rate:.0f} texts/s)")
        metrics["encode_texts_per_s"] = rate

        # Device-time texts/s by the SLOPE method: the wall rate above
        # pays the relay's per-dispatch overhead once per bucket batch
        # (~30-45 ms in degraded mode — comparable to the forward
        # itself), so it understates the chip. Same discipline as the
        # search headline: r forwards inside ONE jitted fori_loop on a
        # fixed token batch; the constant relay cost cancels in the
        # difference. Tokenization is host-side and measured elsewhere
        # (C++ WordPiece: 18 MB/s — BASELINE.md).
        try:
            from legal_rag_tpu.models.minilm import minilm_encode
            from legal_rag_tpu.models.wordpiece import pad_and_bucket

            tok = engine.encoder._fast_tokenizer or engine.encoder.tokenizer
            ecfg = engine.encoder.cfg
            # a representative INGEST batch: 64 median-length corpus
            # chunks (the production encode length-sorts, so a steady
            # ingest batch looks like this, not like 10-token queries)
            enc = sorted(
                (
                    np.asarray(
                        tok.encode(c["text"], max_len=ecfg.max_len),
                        np.int32,
                    )
                    for c in store.chunks[:256]
                ),
                key=len,
            )
            mid = len(enc) // 2
            enc = enc[mid - Q_BATCH // 2 : mid + Q_BATCH // 2]
            ids, emask = pad_and_bucket(enc, ecfg.max_len, tok.pad_id)
            ids_j = jnp.asarray(ids)
            mask_j = jnp.asarray(emask, jnp.float32)
            eprec = (
                jax.lax.Precision.DEFAULT
                if ecfg.dtype == "bfloat16"
                else jax.lax.Precision.HIGHEST
            )
            eparams = engine.encoder.params

            # params/ids/mask as jit ARGUMENTS (not closures): same
            # constant-baking fix as the search slope above — closing
            # over the ~90 MB parameter tree made the HLO enormous
            def enc_loop(r, params, ids_a, mask_a):
                def step(i, acc):
                    # i-dependence via the float mask (1 + i*1e-30 is a
                    # numeric no-op; mean-pool divides it back out) so
                    # XLA cannot hoist the forward out of the loop
                    m = mask_a * (1.0 + i.astype(jnp.float32) * 1e-30)
                    emb = minilm_encode(params, ids_a, m, ecfg,
                                        precision=eprec)
                    return acc + emb.sum()
                return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

            enc_fn = jax.jit(enc_loop)
            enc_jit = lambda r: enc_fn(r, eparams, ids_j, mask_j)  # noqa: E731
            float(enc_jit(1))

            def enc_t(r):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(enc_jit(r))
                    best = min(best, time.perf_counter() - t0)
                return best

            enc_dt = (enc_t(34) - enc_t(4)) / 30
            if enc_dt > 0:
                dev_rate = len(queries) / enc_dt
                log(f"encode device texts/s (slope): {dev_rate:.0f} "
                    f"({enc_dt*1e3:.2f} ms/batch-{len(queries)} device)")
                metrics["encode_texts_per_s_device"] = dev_rate
        except BenchDeadline:
            raise
        except Exception as e:  # noqa: BLE001
            log(f"encode device slope failed: {type(e).__name__}: {e}")
        if rate < 500:
            log(
                f"DIAGNOSTIC: encode {rate:.0f} texts/s with dispatch "
                f"floors {[f'{f*1e3:.2f}' for f in enc_floors]} ms "
                f"(healthy ~0.03 ms) — relay degraded-dispatch mode, "
                f"not encoder compute"
            )

    return metrics


def _probe_relay() -> bool:
    """Device-backend health probe in a kill-able SUBPROCESS.

    A fully-downed relay blocks jax's PJRT client constructor in C for
    ~45 min, where SIGALRM cannot fire — probing in-process would hang
    this run past any deadline. The subprocess inherits the full env
    (so it exercises the exact backend path main() will take) and is
    hard-killed on timeout.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "import jax.numpy as jnp; float(jnp.arange(4).sum()); "
             "print(d[0].platform)"],
            capture_output=True, text=True, timeout=150,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception as e:  # noqa: BLE001 - probe must never raise
        log(f"relay probe error: {type(e).__name__}: {e}")
        return False


BANK_PATH = os.path.join(REPO, "BENCH_BANK.json")


def _bank_write(metrics) -> None:
    """Persist a healthy slope measurement with provenance.

    Round-3 postmortem: the relay died ~7 h before the driver snapshot
    and the round's record became `value 0.0, relay_down: true` even
    though the same numbers had been measured cleanly earlier in the
    round. The bank makes a healthy in-round measurement durable: it is
    only ever written by a slope-verified run, carries its timestamp and
    git sha, and is committed so its provenance is checkable.
    """
    try:
        import subprocess

        sha = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:  # noqa: BLE001
        sha = "unknown"
    bank = {
        "metric": "hybrid_search_qps_per_chip_batch64",
        "value": round(metrics["dev_qps"], 1),
        "unit": "qps",
        "vs_baseline": round(metrics["dev_qps"] / metrics["cpu_qps"], 2)
        if metrics.get("cpu_qps") else None,
        "cpu_qps": round(metrics.get("cpu_qps", 0.0), 1),
        "recall_at_k": metrics.get("recall_at_k"),
        "single_device_ms": metrics.get("single_device_ms"),
        "encode_texts_per_s": metrics.get("encode_texts_per_s"),
        "measured_unix_ts": time.time(),
        "measured_iso": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_sha": sha,
        "method": "slope (device time; relay overhead cancels)",
    }
    try:
        tmp = BANK_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(bank, f, indent=1)
        os.replace(tmp, BANK_PATH)
        log(f"banked healthy measurement to {BANK_PATH}")
    except OSError as e:
        log(f"bank write failed: {e}")


def _bank_read():
    try:
        with open(BANK_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _bank_usable(bank) -> bool:
    """Gate on whether a banked number may stand in for a failed fresh
    measurement (ADVICE r4): it must be recent (≤24 h — an in-round
    measurement, not a relic) and from this commit lineage (its sha is
    HEAD or an ancestor of HEAD), so a perf regression introduced at
    HEAD cannot hide behind a pre-regression bank from another branch.
    A bank within lineage+window can still predate the latest commits;
    the emitted record therefore always carries banked/measured_iso/
    git_sha so consumers can see exactly what they are reading."""
    if not bank or not bank.get("value"):
        return False
    ts = bank.get("measured_unix_ts")
    if not ts or time.time() - ts > 24 * 3600:
        log("bank unusable: measurement older than 24 h")
        return False
    sha = bank.get("git_sha", "")
    if sha and sha != "unknown":
        try:
            import subprocess

            head = subprocess.run(
                ["git", "-C", REPO, "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
            if sha != head:
                rc = subprocess.run(
                    ["git", "-C", REPO, "merge-base", "--is-ancestor",
                     sha, "HEAD"],
                    capture_output=True, timeout=10,
                ).returncode
                if rc != 0:
                    log("bank unusable: sha not in HEAD's lineage")
                    return False
        except Exception as e:  # noqa: BLE001 - guard must never raise
            log(f"bank sha check skipped ({type(e).__name__}: {e})")
    return True


def run():
    """Deadline-guarded driver entry: the JSON line MUST appear even if
    a late measurement stalls on a wedged device relay."""
    metrics = {}
    # persistent XLA compile cache: repeated bench runs (driver rounds)
    # skip recompiles of every search/encode bucket
    from legal_rag_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(os.path.join(REPO, ".bench_cache", "jax"))
    _install_handler()
    # Gate on relay health BEFORE any in-process jax init (un-killable
    # C-level hang otherwise — see _probe_relay). Retry inside the
    # budget: outages observed to clear within minutes.
    while not _probe_relay():
        if _remaining() < 240:
            bank = _bank_read()
            if _bank_usable(bank):
                log("DIAGNOSTIC: device relay DOWN for the whole bench "
                    "budget — re-emitting the BANKED in-round "
                    f"measurement from {bank.get('measured_iso')} "
                    f"(sha {bank.get('git_sha', '?')[:10]}); fresh "
                    "measurement impossible this run")
                print(json.dumps({
                    "metric": bank["metric"],
                    "value": bank["value"],
                    "unit": bank["unit"],
                    "vs_baseline": bank.get("vs_baseline"),
                    "relay_down": True,
                    "banked": True,
                    "measured_iso": bank.get("measured_iso"),
                    "git_sha": bank.get("git_sha"),
                }))
                return
            log("DIAGNOSTIC: device relay DOWN for the whole bench "
                "budget — no measurement possible this run")
            print(json.dumps({
                "metric": "hybrid_search_qps_per_chip_batch64",
                "value": 0.0,
                "unit": "qps",
                "vs_baseline": None,
                "relay_down": True,
            }))
            return
        log(f"relay probe failed; retrying ({_remaining():.0f}s left)")
        time.sleep(45)
    try:
        main(metrics)
    except BenchDeadline:
        log("bench deadline hit — emitting metrics gathered so far")
    except Exception as e:  # noqa: BLE001
        log(f"bench aborted: {type(e).__name__}: {e}")
    finally:
        _disarm()
    dev_qps = metrics.get("dev_qps", 0.0)
    cpu_qps = metrics.get("cpu_qps", 0.0)
    if not metrics.get("slope_ok") and dev_qps:
        log("WARNING: headline is wall timing (no slope measurement "
            "succeeded) — treat as a lower bound, not device time")
    if metrics.get("slope_ok") and dev_qps and cpu_qps:
        _bank_write(metrics)
    record = {
        "metric": "hybrid_search_qps_per_chip_batch64",
        "value": round(dev_qps, 1),
        "unit": "qps",
        "vs_baseline": round(dev_qps / cpu_qps, 2) if cpu_qps else None,
    }
    if not dev_qps:
        # VERDICT r4 1(c): ANY exit with dev_qps == 0 consults the bank
        # (round 4 hit this with a live relay and emitted 0.0 while a
        # sha-stamped healthy measurement sat in BENCH_BANK.json). The
        # _bank_usable guard enforces freshness + lineage.
        bank = _bank_read()
        if _bank_usable(bank):
            log("DIAGNOSTIC: fresh measurement failed this run — "
                "re-emitting the BANKED in-round measurement from "
                f"{bank.get('measured_iso')} "
                f"(sha {bank.get('git_sha', '?')[:10]})")
            record.update({
                "value": bank["value"],
                "vs_baseline": bank.get("vs_baseline"),
                "banked": True,
                "measured_iso": bank.get("measured_iso"),
                "git_sha": bank.get("git_sha"),
            })
    # Informational HTTP serving latency (VERDICT r4 item 6): surface
    # the committed load-test artifact's healthy single-client p50 so
    # the driver record carries the serving-path number alongside the
    # device-time headline. Measured by scripts/bench_http.py, not here
    # (a live server load test does not fit the bench budget).
    try:
        with open(os.path.join(REPO, "BENCH_HTTP_TPU.json")) as f:
            http_rep = json.load(f)
        c1 = http_rep["passes"]["coalesced"][0]
        if c1.get("concurrency") == 1:
            record["http_p50_ms_c1"] = c1["p50_ms"]
    except (OSError, ValueError, KeyError, IndexError):
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    run()
