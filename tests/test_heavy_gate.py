"""Heavy-out protocol under tie-heavy corpora: hundreds of docs whose
token repeats overflow the packed plane meta (heavy) and tie on the text
score, so eligibility is decided by the K-th light result's FULL sort
tuple (kernels.dense2_kernel_body heavy_out gate). Ranking must match the
probe path, which walks full position lists exactly (or_iterator.h
behavior contract)."""

import random

import pytest


def _build(monkeypatch, force_mode=None):
    from typesense_tpu.collection import Collection
    from typesense_tpu.schema.field import Field
    monkeypatch.setenv("TS_PLANE_CACHE_MIN_N", "1")
    monkeypatch.setenv("TS_PLANE_CACHE_ROWS", "16")
    rng = random.Random(11)
    filler = ["golf", "hotel", "india", "juliet", "kilo"]
    docs = []
    # 500 HEAVY docs: 'alpha' appears 4-6 times in the title (cnt > 3
    # overflows meta64), all containing 'bravo' too -> they match the
    # 2-token query and tie near-optimally on text score
    for i in range(500):
        reps = ["alpha"] * rng.randint(4, 6)
        docs.append({"title": " ".join(reps + ["bravo"]),
                     "points": rng.randint(0, 100000)})
    # 600 light docs matching the same query
    for i in range(600):
        docs.append({"title": "alpha bravo " + " ".join(
            rng.sample(filler, 2)), "points": rng.randint(0, 100000)})
    # 400 noise docs
    for i in range(400):
        docs.append({"title": " ".join(rng.sample(filler, 3)),
                     "points": rng.randint(0, 100000)})
    c = Collection(f"hg_{force_mode}", [
        Field("title", "string"),
        Field("points", "int32"),
    ], default_sorting_field="points")
    for d in docs:
        c.docs[c.next_seq_id] = d
        c.id_to_seq[str(c.next_seq_id)] = c.next_seq_id
        c.next_seq_id += 1
    c._dirty = True
    eng = c._ensure_index()
    if force_mode:
        eng._force_mode = force_mode
    return c


def _hits(c, q, **kw):
    res = c.search({"q": q, "query_by": "title", "prefix": "false",
                    "num_typos": "0", "per_page": 30, **kw})
    return (res["found"], [(h["document"]["title"], h["text_match"],
                            h["document"]["points"]) for h in res["hits"]])


@pytest.mark.parametrize("kw", [
    {},                                            # text, points, id order
    {"sort_by": "points:desc"},                    # tuple gate on points
    {"sort_by": "_text_match:desc,points:asc"},    # ascending tie-break
])
def test_heavy_gate_matches_probe(monkeypatch, kw):
    probe = _build(monkeypatch, force_mode="probe")
    dense = _build(monkeypatch, force_mode="dense2")
    for q in ["alpha bravo", "alpha golf", "bravo alpha hotel"]:
        assert _hits(probe, q, **kw) == _hits(dense, q, **kw), (q, kw)
