#!/usr/bin/env python
"""Benchmark: keyword search latency over the HN stories corpus on the real
TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): reference avg 11 ms/query concurrent on 2.2M recipes
(4 vCPUs). vs_baseline = baseline_ms / our_p50_ms (>1 means faster than the
reference's published average).

Env knobs: BENCH_DOCS (default 100000), BENCH_QUERIES (default 200).
"""

from __future__ import annotations

import gzip
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_AVG_MS = 11.0
HN_PATH = "/root/reference/test/resources/hnstories.jsonl.gz"


def load_docs(n: int) -> list[dict]:
    docs = []
    with gzip.open(HN_PATH, "rt", encoding="utf-8", errors="ignore") as f:
        for i, line in enumerate(f):
            if i >= n:
                break
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            docs.append({"title": d.get("title", ""),
                         "points": int(d.get("points", 0) or 0)})
    return docs


def main():
    n_docs = int(os.environ.get("BENCH_DOCS", 100000))
    n_queries = int(os.environ.get("BENCH_QUERIES", 200))

    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field

    t0 = time.time()
    docs = load_docs(n_docs)
    coll = Collection("hn", [Field("title", "string"), Field("points", "int32")],
                      default_sorting_field="points")
    for d in docs:
        coll.docs[coll.next_seq_id] = d
        coll.id_to_seq[str(coll.next_seq_id)] = coll.next_seq_id
        coll.next_seq_id += 1
    coll._dirty = True
    engine = coll._ensure_index()
    build_s = time.time() - t0
    print(f"# indexed {len(docs)} docs in {build_s:.1f}s "
          f"({engine.seg.num_terms} terms)", file=sys.stderr)

    # queries: common single tokens + bigrams sampled from titles
    rng = random.Random(42)
    common = [w.strip() for w in open(
        "/root/reference/test/resources/common100_english.txt")][:50]
    vocab = [t for t in common if t in engine.seg.term_to_id]
    bigrams = []
    for d in rng.sample(docs, min(500, len(docs))):
        words = [w.lower() for w in d["title"].split() if w.isalpha()]
        if len(words) >= 2:
            i = rng.randrange(len(words) - 1)
            bigrams.append(f"{words[i]} {words[i+1]}")
    queries = ([rng.choice(vocab) for _ in range(n_queries // 2)] +
               [rng.choice(bigrams) for _ in range(n_queries - n_queries // 2)])
    rng.shuffle(queries)

    params = {"query_by": "title", "prefix": "false", "num_typos": "0",
              "per_page": 10}

    # warm up compile caches
    for wq in queries[:20]:
        coll.search({**params, "q": wq})

    lats = []
    t_start = time.time()
    for q in queries:
        t = time.perf_counter()
        coll.search({**params, "q": q})
        lats.append((time.perf_counter() - t) * 1000)
    wall = time.time() - t_start

    lats.sort()
    p50 = lats[len(lats) // 2]
    p99 = lats[int(len(lats) * 0.99)]
    qps = len(queries) / wall
    print(f"# p50={p50:.2f}ms p99={p99:.2f}ms qps={qps:.1f} "
          f"build={build_s:.1f}s", file=sys.stderr)

    print(json.dumps({
        "metric": f"keyword_search_p50_ms_hn{len(docs)//1000}k",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_AVG_MS / max(p50, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
