"""Profiling REPL setup: 2.2M bench corpus -> index, fast injection.
Run: python -i prof_setup.py   (inside tmux; keeps the index resident)
"""
import os, sys, time, random
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from bench import synth_corpus

N = int(os.environ.get("PROF_DOCS", 2_200_000))
t0 = time.time()
docs, head = synth_corpus(N)
print(f"corpus gen/load: {time.time()-t0:.1f}s", flush=True)

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field

t0 = time.time()
coll = Collection("recipes", [
    Field("title", "string"),
    Field("ingredients", "string[]"),
    Field("cuisine", "string", facet=True),
    Field("popularity", "int32"),
], default_sorting_field="popularity")
for d in docs:
    coll.docs[coll.next_seq_id] = d
    coll.id_to_seq[str(coll.next_seq_id)] = coll.next_seq_id
    coll.next_seq_id += 1
coll._dirty = True
print(f"inject: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
engine = coll._ensure_index()
print(f"index build: {time.time()-t0:.1f}s", flush=True)
seg = engine.seg
print(f"N={engine.N} T={seg.num_terms} postings={len(seg.post_doc_ids)}",
      flush=True)
print(f"head rows: {len(engine.names['head_map'])}", flush=True)

# bench-identical query mix
rng = random.Random(42)
queries = []
for _ in range(300):
    words = rng.choice(docs)["title"].split()
    r = rng.random()
    n_tok = 2 if r < 0.5 else (3 if r < 0.8 else 1)
    queries.append(" ".join(rng.sample(words, min(n_tok, len(words)))))
params = {"query_by": "title,ingredients", "prefix": "false",
          "num_typos": "0", "per_page": 10}

def search(q, **kw):
    return coll.search({**params, "q": q, **kw})

def timeq(q, n=5, **kw):
    search(q, **kw)
    import jax
    ts = []
    for _ in range(n):
        t = time.perf_counter()
        search(q, **kw)
        ts.append((time.perf_counter() - t) * 1000)
    return min(ts)

print("READY", flush=True)
