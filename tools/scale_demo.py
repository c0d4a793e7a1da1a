"""Single-chip scale demo: index 8.8M docs (4x the 2.2M bench corpus,
same recipes schema) on one TPU and record build time, index size and
warm keyword QPS. Begins the reference's 28M-books scaling story
(/root/reference/README.md:113-115: 28M docs, ~14 GB RAM, 46 QPS) —
doc-count per chip here is HBM-bound, multi-chip sharding
(parallel/sharded.py) carries it beyond.

Writes SCALE_r05.json. Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site
python tools/scale_demo.py [n_docs]
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_800_000
    from bench import synth_corpus
    t0 = time.time()
    docs, head = synth_corpus(n)
    gen_s = time.time() - t0

    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    coll = Collection("recipes8m", [
        Field("title", "string"),
        Field("ingredients", "string[]"),
        Field("cuisine", "string", facet=True),
        Field("popularity", "int32"),
    ], default_sorting_field="popularity")
    t0 = time.time()
    for d in docs:
        coll.docs[coll.next_seq_id] = d
        coll.id_to_seq[str(coll.next_seq_id)] = coll.next_seq_id
        coll.next_seq_id += 1
    coll._dirty = True
    inject_s = time.time() - t0
    t0 = time.time()
    engine = coll._ensure_index()
    build_s = time.time() - t0

    import numpy as np
    seg = engine.seg
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
    out = {"n_docs": n, "gen_s": round(gen_s, 1),
           "inject_s": round(inject_s, 1),
           "index_build_s": round(build_s, 1),
           "index_mb": round(total / 1e6, 1),
           "terms": int(seg.num_terms),
           "postings": int(len(seg.post_doc_ids))}

    rng = random.Random(42)
    queries = []
    for _ in range(160):
        words = rng.choice(docs)["title"].split()
        r = rng.random()
        ntok = 2 if r < 0.5 else (3 if r < 0.8 else 1)
        queries.append(" ".join(rng.sample(words, min(ntok, len(words)))))
    params = {"query_by": "title,ingredients", "prefix": "false",
              "num_typos": "0", "per_page": 10}
    t0 = time.time()
    for q in queries:
        coll.search({**params, "q": q})
    out["warm_pass_s"] = round(time.time() - t0, 1)

    lats = []
    t0 = time.time()
    for q in queries:
        t = time.perf_counter()
        coll.search({**params, "q": q})
        lats.append((time.perf_counter() - t) * 1000)
    lats.sort()
    out["p50_ms"] = round(lats[len(lats) // 2], 1)
    out["p99_ms"] = round(lats[int(len(lats) * 0.99)], 1)

    from concurrent.futures import ThreadPoolExecutor
    conc = 16
    chunks = [queries[i::conc] for i in range(conc)]

    def worker(qs):
        for q in qs:
            coll.search({**params, "q": q})
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=conc) as ex:
        list(ex.map(worker, chunks))
    out["keyword_qps_c16"] = round(len(queries) / (time.time() - t0), 1)

    from typesense_tpu.search.engine import PLANE_CACHE_STATS
    out["plane_cache"] = dict(PLANE_CACHE_STATS)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
