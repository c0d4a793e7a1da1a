#!/usr/bin/env python
"""Benchmark on the real TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Corpus: no large corpus ships in the image (reference hnstories.jsonl.gz has
14 rows; recipes.jsonl has 3), so we synthesize a recipes-like corpus with a
Zipfian vocabulary — titles (4-9 tokens), ingredient lists, a numeric
popularity column and a cuisine facet. Deterministic via seed.

Measured: keyword search p50/p99 latency single-stream, and QPS with
concurrent streams (the reference baseline is concurrent: 104 QPS / 11 ms
avg on 2.2M recipes with 4 vCPUs — BASELINE.md). vs_baseline compares
against the published 104 QPS.

Budget discipline: BENCH_BUDGET_S (default 540) is a soft wall-clock cap.
Every stage checks the remaining budget before starting and is skipped with
a stderr note when it no longer fits; a SIGTERM/SIGALRM handler emits the
final JSON with everything measured so far, so an external `timeout` kill
still yields a parsable record (round-3's rc=124 yielded nothing).

Env knobs: BENCH_DOCS (default 2200000 — the reference baseline corpus
scale), BENCH_QUERIES (default 300), BENCH_CONCURRENCY (default 16),
BENCH_BUDGET_S, BENCH_EXTRAS=0, BENCH_SMALL=0, BENCH_VECTOR_DOCS.
"""

from __future__ import annotations

import json
import math
import os
import random
import signal
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_AVG_MS = 11.0
BASELINE_QPS = 104.0  # README.md:111 concurrent QPS, 2.2M recipes, 4 vCPUs

T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 780))
RESULTS: dict = {}
_EMITTED = False


def remaining() -> float:
    return BUDGET_S - (time.time() - T_START)


def note(msg: str):
    print(f"# {msg}", file=sys.stderr, flush=True)


def emit(final: bool = False):
    """Print the single JSON result line exactly once."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    conc = RESULTS.pop("_conc", 16)
    nd = RESULTS.pop("_docs", int(os.environ.get("BENCH_DOCS", 2200000)))
    qps = RESULTS.pop("_qps", 0.0)
    out = {
        "metric": f"keyword_qps_c{conc}_{nd // 1000}k_docs",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        **RESULTS,
    }
    print(json.dumps(out), flush=True)


def _on_term(signum, frame):
    note(f"signal {signum} at t={time.time() - T_START:.0f}s — emitting "
         f"partial results")
    emit()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_term)
signal.signal(signal.SIGALRM, _on_term)
signal.signal(signal.SIGINT, _on_term)


def synth_corpus(n: int, seed: int = 7):
    """Recipes-like corpus with a REALISTIC vocabulary: ~30k distinct words
    under one Zipf law (s~1.07, like English text) — the most common word
    appears in a few percent of documents, not a third, matching the posting
    distribution the reference's 2.2M-recipe benchmark sees.

    Vectorized: word ranks come from a quantized inverse-CDF table
    (exp(u * lnV) over 2^16 quantiles) sampled in bulk; strings are
    assembled from one flat word list. ~6x faster than the per-doc
    random.Random loop at 2.2M on one core, same distribution.

    Disk-cached: generation cost 24-75s at 2.2M depending on host load
    (round-3's 74.9s burned 1/7 of the bench budget); the pickle reloads
    in ~3s."""
    import pickle
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    cpath = os.path.join(cache, f"corpus_{n}_{seed}.pkl")
    if os.path.exists(cpath):
        try:
            with open(cpath, "rb") as f:
                return pickle.load(f)
        except Exception:  # noqa: BLE001 — torn cache: regenerate
            pass
    docs_vocab = _synth_corpus_gen(n, seed)
    try:
        tmp = cpath + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(docs_vocab, f, protocol=5)
        os.replace(tmp, cpath)
    except OSError:
        pass
    return docs_vocab


def _synth_corpus_gen(n: int, seed: int):
    import numpy as np
    culinary = ("chicken beef pork lamb salmon tuna pasta rice noodle bread "
                "cake chocolate vanilla lemon garlic onion tomato basil "
                "cheese cream butter olive spicy sweet roasted grilled baked "
                "fried fresh easy quick classic homemade soup salad stew "
                "curry pie tart sauce glaze herb crispy tender juicy golden "
                "simple perfect").split()
    vocab = culinary + [f"w{i}" for i in range(30000 - len(culinary))]
    V = len(vocab)
    cuisines = ["italian", "mexican", "thai", "indian", "french", "american",
                "chinese", "japanese", "greek", "korean"]
    rng = np.random.default_rng(seed)
    TBL = 1 << 20   # 2^20 quantiles keep ~all 30K ranks reachable (2^16
    # collapsed the tail to ~16K distinct words)
    # rank table: exp(u*lnV)-1 for u in [0,1) quantiles — freq(rank) ~ 1/rank
    table = np.minimum(
        np.exp(np.linspace(0.0, math.log(V), TBL, endpoint=False))
        .astype(np.int64) - 1, V - 1)
    table = np.maximum(table, 0)
    tl = rng.integers(4, 10, n)          # title word counts
    il = rng.integers(5, 13, n)          # ingredient counts
    t_tot, i_tot = int(tl.sum()), int(il.sum())
    vocab_arr = np.asarray(vocab)
    t_words = vocab_arr[table[rng.integers(0, TBL, t_tot)]].tolist()
    i_words = vocab_arr[table[rng.integers(0, TBL, i_tot)]].tolist()
    pop = rng.integers(0, 100001, n).tolist()
    cui = rng.integers(0, 10, n).tolist()
    t_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tl, out=t_offs[1:])
    i_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(il, out=i_offs[1:])
    docs = []
    join = " ".join
    for i in range(n):
        docs.append({
            "title": join(t_words[t_offs[i]:t_offs[i + 1]]),
            "ingredients": i_words[i_offs[i]:i_offs[i + 1]],
            "cuisine": cuisines[cui[i]],
            "popularity": pop[i],
        })
    return docs, vocab


def main():
    n_docs = int(os.environ.get("BENCH_DOCS", 2200000))
    n_queries = int(os.environ.get("BENCH_QUERIES", 300))
    conc = int(os.environ.get("BENCH_CONCURRENCY", 16))
    RESULTS["_conc"] = conc
    RESULTS["_docs"] = n_docs

    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field

    t0 = time.time()
    docs, head = synth_corpus(n_docs)
    gen_s = time.time() - t0

    # honest build: docs flow through the REAL write pipeline — validator
    # coercion, id assignment, durable store writes — then the index build
    # (matches the reference's 3.6-min full import, README.md:110)
    import shutil
    import tempfile

    from typesense_tpu.core.store import Store

    store_dir = tempfile.mkdtemp(prefix="ts_bench_store_")
    t0 = time.time()
    coll = Collection("recipes", [
        Field("title", "string"),
        Field("ingredients", "string[]"),
        Field("cuisine", "string", facet=True),
        Field("popularity", "int32"),
    ], default_sorting_field="popularity",
        store=Store(store_dir + "/db"))
    B = 50000
    for i in range(0, len(docs), B):
        res = coll.add_many(docs[i:i + B])
        bad = [r for r in res if not r.get("success")]
        assert not bad, bad[:1]
    import_s = time.time() - t0
    engine = coll._ensure_index()
    build_s = time.time() - t0
    RESULTS["build_s"] = round(build_s, 1)
    RESULTS["import_s"] = round(import_s, 1)
    RESULTS["index_s"] = round(build_s - import_s, 1)
    # stage breakdown of the index build proper (VERDICT r4 #4): token
    # sweep, native counting-sort finalize, segment assembly, device upload
    from typesense_tpu.index.builder import BUILD_TIMINGS
    for bk, bv in BUILD_TIMINGS.items():
        RESULTS[f"bt_{bk}"] = bv
    shutil.rmtree(store_dir, ignore_errors=True)

    def seg_bytes(seg):
        import numpy as np
        total = 0
        for v in vars(seg).values():
            if isinstance(v, np.ndarray):
                total += v.nbytes
            elif isinstance(v, dict):
                for x in v.values():
                    if isinstance(x, np.ndarray):
                        total += x.nbytes
                    elif isinstance(x, tuple):
                        total += sum(y.nbytes for y in x
                                     if isinstance(y, np.ndarray))
        return total

    index_mb = seg_bytes(engine.seg) / 1e6
    RESULTS["index_mb"] = round(index_mb, 1)
    note(f"gen={gen_s:.1f}s build={build_s:.1f}s docs={len(docs)} "
         f"terms={engine.seg.num_terms} "
         f"postings={len(engine.seg.post_doc_ids)} index_mb={index_mb:.0f}")

    # queries sampled from real document titles (instant-search-like: users
    # type words that exist in the corpus, co-occurring ones)
    rng = random.Random(42)
    queries = []
    for _ in range(n_queries):
        words = rng.choice(docs)["title"].split()
        r = rng.random()
        if r < 0.5:
            n_tok = 2
        elif r < 0.8:
            n_tok = 3
        else:
            n_tok = 1
        queries.append(" ".join(rng.sample(words, min(n_tok, len(words)))))

    params = {"query_by": "title,ingredients", "prefix": "false",
              "num_typos": "0", "per_page": 10}

    # warm every kernel shape bucket the query mix can hit (1/2/3 tokens),
    # so compiles don't land inside the timed window. SERIAL on purpose:
    # this rig has ONE host core — concurrent warmers thrash the GIL during
    # MLIR lowering and oversubscribe XLA's compile threads (measured: 8-way
    # warmup stalled >30 min where serial finishes). The persistent compile
    # cache makes later runs skip the compiles entirely.
    t0 = time.time()
    warm = ([rng.choice(head) for _ in range(4)] +
            [" ".join(rng.sample(head[:50], 2)) for _ in range(6)] +
            [" ".join(rng.sample(head[:50], 3)) for _ in range(6)])
    deadline = T_START + BUDGET_S - 60
    n_warm = 0
    warm_all = warm + queries
    warm_cut = False
    for wq in warm_all:
        if time.time() >= deadline:
            warm_cut = True
            note(f"warmup cut short by budget after {n_warm} queries")
            break
        try:
            coll.search({**params, "q": wq})
        except Exception as e:  # noqa: BLE001
            note(f"warm error: {e}")
        n_warm += 1
    warmup_s = time.time() - t0
    RESULTS["warmup_s"] = round(warmup_s, 1)
    note(f"warmup={warmup_s:.1f}s")
    # WARMTH VERIFICATION (round-4 postmortem: compiles inside the timed
    # window produced a 4.2-QPS headline that measured XLA, not the engine).
    # A re-run of a handful of already-warmed queries must be compile-free
    # fast; if not — or warmup was cut short — the timed sections are
    # SKIPPED and the emitted record carries cold_cache=1 + qps 0 so a
    # polluted number can never become the headline.
    probe = [q for q in queries[:8]]
    t0 = time.time()
    for q in probe:
        try:
            coll.search({**params, "q": q})
        except Exception as e:  # noqa: BLE001
            note(f"probe error: {e}")
    probe_ms = (time.time() - t0) * 1000 / max(len(probe), 1)
    RESULTS["warm_probe_ms"] = round(probe_ms, 1)
    if warm_cut or probe_ms > 1000:
        RESULTS["cold_cache"] = 1
        note(f"COLD CACHE (warm_cut={warm_cut} probe={probe_ms:.0f}ms) — "
             f"timed sections skipped; run bench again with a warm "
             f".jax_cache for a valid headline")
        if os.environ.get("BENCH_EXTRAS", "1") != "0" and remaining() > 120:
            run_extra_configs(coll, queries, rng, conc)
        emit()
        return

    # batch-tier warm: concurrent same-signature waves make the query
    # coalescer start its background vmapped-tier compiles; wait for them
    # so the timed sections measure batched dispatch (persistent cache
    # makes this a fast load after the first-ever run)
    from typesense_tpu.search.engine import QUERY_BATCHER
    if QUERY_BATCHER.enabled and remaining() > 90:
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=conc) as ex:
            list(ex.map(lambda q: coll.search({**params, "q": q}),
                        queries))
        QUERY_BATCHER.wait_tiers(timeout=max(10, remaining() - 75))
        note(f"batch_tier_warm={time.time() - t0:.1f}s")

    # single-stream latency: dominated by the axon tunnel RTT (~28 ms per
    # blocking dispatch+readback on this rig); the engine issues ONE round
    # trip per query, so p50 ~ RTT. Host-attached TPU would not pay this.
    lats = []
    for q in queries:
        t = time.perf_counter()
        coll.search({**params, "q": q})
        lats.append((time.perf_counter() - t) * 1000)
        if remaining() < 45:
            break
    lats.sort()
    if len(lats) >= 30:
        RESULTS["p50_ms"] = round(lats[len(lats) // 2], 3)
        RESULTS["p99_ms"] = round(lats[int(len(lats) * 0.99)], 3)
    else:
        note(f"single-stream section under-sampled ({len(lats)}) — skipped")

    # concurrent throughput (headline — matches the reference's published
    # "104 concurrent QPS" config on 2.2M recipes / 4 vCPUs, BASELINE.md):
    # in-flight queries pipeline over the tunnel, hiding the RTT. The loop
    # is deadline-gated: workers stop when the budget runs dry and QPS is
    # computed over COMPLETED queries only (round-4's unguarded loop let
    # compile stalls burn the whole budget inside the timed window).
    if remaining() < 20:
        note("no budget left for the concurrent section — headline omitted")
        RESULTS["cold_cache"] = 1
        emit()
        return
    import threading
    done_n = [0] * conc
    c_deadline = time.time() + max(remaining() - 15, 10)

    def worker(wi):
        qs = queries[wi::conc]
        for q in qs:
            if time.time() >= c_deadline:
                return
            coll.search({**params, "q": q})
            done_n[wi] += 1
    t0 = time.time()
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    n_done = sum(done_n)
    qps = n_done / (time.time() - t0)
    if n_done < len(queries):
        RESULTS["concurrent_completed"] = n_done
    RESULTS["_qps"] = qps

    note(f"p50={RESULTS.get('p50_ms', -1):.2f}ms "
         f"p99={RESULTS.get('p99_ms', -1):.2f}ms "
         f"qps(c={conc})={qps:.1f} t={time.time() - T_START:.0f}s")
    note(f"batcher={QUERY_BATCHER.stats()}")
    from typesense_tpu.search.engine import PLANE_CACHE_STATS
    note(f"plane_cache={PLANE_CACHE_STATS}")
    h, m = PLANE_CACHE_STATS["hits"], PLANE_CACHE_STATS["misses"]
    if h + m:
        RESULTS["plane_cache_hit_pct"] = round(100 * h / (h + m), 1)

    if os.environ.get("BENCH_EXTRAS", "1") != "0":
        # an extras failure (e.g. an OOM on a config-specific compile) must
        # never cost the already-measured headline its emit
        try:
            run_extra_configs(coll, queries, rng, conc)
        except Exception as e:  # noqa: BLE001
            note(f"extras aborted: {type(e).__name__}: {e}")

    emit()


def timed_qps_for(c, qlist, params, conc):
    """Warm solo shapes + batch tiers on collection `c`, then time the
    concurrent run (shared by the 2.2M extras and the 300K sub-run)."""
    from typesense_tpu.search.engine import QUERY_BATCHER
    for q in qlist:
        c.search({**params, "q": q})
    if QUERY_BATCHER.enabled:
        with ThreadPoolExecutor(max_workers=conc) as ex:
            list(ex.map(lambda q: c.search({**params, "q": q}), qlist))
        QUERY_BATCHER.wait_tiers(timeout=max(10, remaining() - 30))

    def worker(qs):
        for q in qs:
            c.search({**params, "q": q})
    chunks = [qlist[i::conc] for i in range(conc)]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=conc) as ex:
        list(ex.map(worker, chunks))
    return round(len(qlist) / (time.time() - t0), 1)


def _vector_corpus(NV: int, DIM: int):
    """2M x 768 f32 gaussian-mixture corpus (real embedding corpora
    cluster; uniform-random vectors have no neighbor structure for ANY
    index, HNSW included). Noise rows come from a 200K-row pool — fresh
    noise for 2M x 768 costs ~90 s of host RNG alone on this 1-core rig;
    the pool keeps pairwise geometry (only ~3 same-cluster/same-noise
    collisions in 2M). Cached on disk: later runs mmap it back."""
    import numpy as np
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"vecs_{NV}_{DIM}.npy")
    lab_path = os.path.join(cache, f"lab_{NV}_{DIM}.npy")
    NCOMP = 3000
    vrng = np.random.default_rng(3)
    centers = vrng.standard_normal((NCOMP, DIM)).astype(np.float32)
    lab = vrng.integers(0, NCOMP, NV)
    if os.path.exists(path) and os.path.exists(lab_path):
        return np.load(path, mmap_mode="r"), np.load(lab_path), centers
    POOL = min(200_000, NV)
    noise = vrng.standard_normal((POOL, DIM), dtype=np.float32)
    vecs = np.empty((NV, DIM), dtype=np.float32)
    nidx = vrng.integers(0, POOL, NV)
    CH = 200_000
    for i in range(0, NV, CH):
        j = min(i + CH, NV)
        blk = centers[lab[i:j]] + 0.35 * noise[nidx[i:j]]
        blk /= np.linalg.norm(blk, axis=1, keepdims=True)
        vecs[i:j] = blk
    np.save(path, vecs)
    np.save(lab_path, lab)
    return vecs, lab, centers


def run_extra_configs(coll, queries, rng, conc):
    """BASELINE.json configs 2-5: typo+prefix, filter+facet+sort, pure
    vector (recall@10 vs exact oracle), hybrid fusion."""
    import numpy as np

    def timed_qps(qlist, params):
        return timed_qps_for(coll, qlist, params, conc)

    out = RESULTS
    sub = queries[:96]
    # config 2: typo-tolerant prefix search with proximity ranking
    if remaining() > 60:
        typo_queries = [q[:-1] + "x" if len(q) > 4 else q for q in sub]
        try:
            out["typo_prefix_qps"] = timed_qps(
                typo_queries, {"query_by": "title,ingredients",
                               "prefix": "true",
                               "num_typos": "2", "per_page": 10})
        except Exception as e:  # noqa: BLE001
            note(f"typo config failed: {type(e).__name__}: {e}")
    else:
        note("skip typo config (budget)")
    # config 3: filtered + faceted + sorted
    if remaining() > 45:
        try:
            out["filter_facet_qps"] = timed_qps(
                sub, {"query_by": "title,ingredients", "prefix": "false",
                      "num_typos": "0", "per_page": 10,
                      "filter_by": "popularity:>50000",
                      "facet_by": "cuisine",
                      "sort_by": "popularity:desc"})
        except Exception as e:  # noqa: BLE001
            note(f"filter config failed: {type(e).__name__}: {e}")
    else:
        note("skip filter config (budget)")

    # config 4: vector search at BASELINE scale — 2M x 768-d bf16 with the
    # IVF probe + exact f32 re-rank, recall@10 vs an exact f32 oracle
    # (index.h:356-389 hnsw_index_t territory)
    NV = int(os.environ.get("BENCH_VECTOR_DOCS", 2_000_000))
    DIM, KQ = 768, 10
    if remaining() > 150:
        # free the keyword engine's ~6 GB plane cache: the vector corpus
        # + IVF need the HBM headroom
        try:
            coll._ensure_index().release_plane_cache()
        except Exception as e:  # noqa: BLE001
            note(f"plane cache release skipped: {e}")
        from typesense_tpu.ops import ivf as ivf_mod
        import jax
        t0 = time.time()
        vecs, lab, centers = _vector_corpus(NV, DIM)
        vgen_s = time.time() - t0
        t0 = time.time()
        ivf = ivf_mod.build_ivf(np.asarray(vecs))
        jax.block_until_ready(ivf.vecs_sorted)
        out["ivf_build_s"] = round(time.time() - t0, 1)
        note(f"vec gen={vgen_s:.0f}s ivf_build={out['ivf_build_s']}s "
             f"cells={ivf.n_cells}")

        vrng = np.random.default_rng(31)
        QN = 24
        qi = vrng.integers(0, NV, QN)
        qv = centers[lab[qi]] + 0.35 * vrng.standard_normal(
            (QN, DIM)).astype(np.float32)
        qv /= np.linalg.norm(qv, axis=1, keepdims=True)
        hits = 0
        lats = []
        ids0, _ = ivf_mod.ivf_search(ivf, qv[0], 4 * KQ + 32, nprobe=64)
        jax.block_until_ready(ids0)
        for i in range(QN):
            t0 = time.perf_counter()
            ids, _ = ivf_mod.ivf_search(ivf, qv[i], 4 * KQ + 32, nprobe=64)
            ids = np.asarray(ids)[0]
            # exact f32 host re-rank over the margin (engine.vector_search)
            valid = ids[ids >= 0]
            d32 = 1.0 - vecs[valid] @ qv[i]
            got = valid[np.argsort(d32, kind="stable")[:KQ]]
            lats.append((time.perf_counter() - t0) * 1000)
            s = vecs @ qv[i]
            part = np.argpartition(-s, KQ)[:KQ]
            oracle = part[np.argsort(-s[part])]
            hits += len(set(int(x) for x in got) &
                        set(int(x) for x in oracle))
        out["vector_recall_at_10"] = round(hits / (QN * KQ), 3)
        lats.sort()
        out["vector_p50_ms_2m_768"] = round(lats[QN // 2], 2)
        del vecs, ivf
    else:
        note("skip vector config (budget)")

    # config 5: hybrid rank fusion (keyword + vector) on a 20k-doc slice
    if remaining() > 60:
        from typesense_tpu.collection import Collection
        from typesense_tpu.schema.field import Field
        NH, HDIM = 20000, 256
        hrng = np.random.default_rng(5)
        hvecs = hrng.standard_normal((NH, HDIM)).astype(np.float32)
        hvecs /= np.linalg.norm(hvecs, axis=1, keepdims=True)
        hqv = hrng.standard_normal((20, HDIM)).astype(np.float32)
        hqv /= np.linalg.norm(hqv, axis=1, keepdims=True)
        hc = Collection("hbench", [Field("title", "string"),
                                   Field("v", "float[]", num_dim=HDIM)])
        for i in range(NH):
            hc.docs[hc.next_seq_id] = {"id": str(i),
                                       "title": coll.docs[i]["title"],
                                       "v": hvecs[i].tolist()}
            hc.id_to_seq[str(i)] = hc.next_seq_id
            hc.next_seq_id += 1
        hc._dirty = True
        hq = [(q, "v:([" + ",".join(f"{x:.5f}" for x in hqv[i % len(hqv)]) +
               "], k: 10, alpha: 0.3)") for i, q in enumerate(sub[:64])]
        for q, v in hq:
            hc.search({"q": q, "query_by": "title", "vector_query": v,
                       "prefix": "false", "num_typos": "0", "per_page": 10})

        def hworker(pairs):
            for q, v in pairs:
                hc.search({"q": q, "query_by": "title", "vector_query": v,
                           "prefix": "false", "num_typos": "0",
                           "per_page": 10})
        hchunks = [hq[i::8] for i in range(8)]
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(hworker, hchunks))
        out["hybrid_qps"] = round(len(hq) / (time.time() - t0), 1)
    else:
        note("skip hybrid config (budget)")

    # semantic sanity: the shipped from-scratch ts-mini checkpoint must
    # embed meaning, not tokens — labeled pairs share concepts with ZERO
    # surface overlap (VERDICT r2 item 5; models/train_encoder.py)
    try:
        from typesense_tpu.models.embedder import EmbedderManager
        enc = EmbedderManager().get({"model_name": "ts/ts-mini"})
        if enc.tokenizer is not None:
            pos_pairs = [("poultry stew", "chicken casserole"),
                         ("quick automobile repair", "speedy vehicle fix"),
                         ("glad pupil", "happy student"),
                         ("frigid breeze", "chilly gust")]
            neg_pairs = [("poultry stew", "bicycle repair"),
                         ("glad pupil", "frigid gust"),
                         ("chilly gust", "happy student"),
                         ("speedy vehicle fix", "moon blossom")]

            def cos(a, b):
                va, vb = enc.embed_batch([a, b])
                return float(va @ vb / (np.linalg.norm(va) *
                                        np.linalg.norm(vb)))
            pos = [cos(a, b) for a, b in pos_pairs]
            neg = [cos(a, b) for a, b in neg_pairs]
            out["semantic_ckpt"] = "ts/ts-mini"
            out["semantic_pair_margin"] = round(min(pos) - max(neg), 3)
            out["semantic_pairs_ok"] = int(min(pos) > max(neg))
    except Exception as e:  # noqa: BLE001
        note(f"semantic sanity skipped: {e}")

    # reference-comparable small corpus: 300K HN-comments-scale sub-run
    if (os.environ.get("BENCH_SMALL", "1") != "0"
            and len(coll.docs) > 400000 and remaining() > 90):
        from typesense_tpu.collection import Collection
        from typesense_tpu.schema.field import Field
        small_docs, _ = synth_corpus(300000, seed=8)
        sc = Collection("recipes300k", [
            Field("title", "string"),
            Field("ingredients", "string[]"),
            Field("cuisine", "string", facet=True),
            Field("popularity", "int32"),
        ], default_sorting_field="popularity")
        for d in small_docs:
            sc.docs[sc.next_seq_id] = d
            sc.id_to_seq[str(sc.next_seq_id)] = sc.next_seq_id
            sc.next_seq_id += 1
        sc._dirty = True
        sc._ensure_index()
        sq = []
        srng = random.Random(43)
        for _ in range(200):
            words = srng.choice(small_docs)["title"].split()
            sq.append(" ".join(srng.sample(words,
                                           min(2, len(words)))))
        base = {"query_by": "title,ingredients", "prefix": "false",
                "num_typos": "0", "per_page": 10}
        out["keyword_qps_300k"] = timed_qps_for(sc, sq, base, conc)

        if remaining() > 45:
            tq = [q[:-1] + "x" if len(q) > 4 else q for q in sq[:96]]
            tbase = {"query_by": "title,ingredients", "prefix": "true",
                     "num_typos": "2", "per_page": 10}
            out["typo_prefix_qps_300k"] = timed_qps_for(sc, tq, tbase, conc)
    else:
        note("skip 300k sub-run (budget)")

    note(f"extras done t={time.time() - T_START:.0f}s")


def _main_guarded():
    """Run main() in a worker thread while the MAIN thread sits in an
    interruptible join loop: Python signal handlers only run on the main
    thread between bytecodes, and main()'s long native waits (XLA compile,
    device sync) would otherwise delay SIGTERM past the driver's kill
    window — the partial-result emit must always fire."""
    import threading
    err: list = []

    def run():
        try:
            main()
        except BaseException as e:  # noqa: BLE001
            err.append(e)
    t = threading.Thread(target=run, daemon=True)
    t.start()
    while t.is_alive():
        t.join(0.25)
    if err:
        raise err[0]


if __name__ == "__main__":
    _main_guarded()
