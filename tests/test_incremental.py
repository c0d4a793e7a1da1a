"""Incremental write tests: delta segment + tombstones, no full rebuild per
write (SURVEY.md §7.7 — the reference mutates in place; we batch into
segments and compact past a threshold)."""

import pytest

from typesense_tpu.collection import Collection
from typesense_tpu.schema.field import Field


def ids(res):
    return sorted(h["document"]["id"] for h in res["hits"])


@pytest.fixture()
def coll():
    c = Collection("inc", [
        Field("title", "string"),
        Field("points", "int32", facet=True),
    ], default_sorting_field="points")
    for i in range(20):
        c.add({"id": str(i), "title": f"base doc number{i}", "points": i})
    c._ensure_index()  # main segment built; subsequent writes go to delta
    return c


def test_delta_writes_visible_without_full_rebuild(coll):
    main_engine = coll._engine
    coll.add({"id": "new1", "title": "fresh delta document", "points": 100})
    res = coll.search({"q": "fresh", "query_by": "title"})
    assert ids(res) == ["new1"]
    # main segment was NOT rebuilt
    assert coll._engine is main_engine
    assert coll._delta_engine is not None
    # old docs still found, merged ranking works
    res = coll.search({"q": "base", "query_by": "title", "per_page": 30})
    assert res["found"] == 20


def test_merged_ranking_across_segments(coll):
    coll.add({"id": "hot", "title": "base doc hottest", "points": 999})
    res = coll.search({"q": "base", "query_by": "title",
                       "sort_by": "points:desc", "per_page": 5})
    got = [h["document"]["id"] for h in res["hits"]]
    assert got[0] == "hot"          # delta doc wins on points
    assert res["found"] == 21


def test_delta_facets_merge(coll):
    coll.add({"id": "n2", "title": "base doc extra", "points": 5})
    res = coll.search({"q": "base", "query_by": "title", "facet_by": "points",
                       "per_page": 1})
    counts = {c["value"]: c["count"]
              for c in res["facet_counts"][0]["counts"]}
    assert counts.get("5") == 2     # one in main + one in delta


def test_tombstone_delete_without_rebuild(coll):
    main_engine = coll._engine
    coll.remove("3")
    res = coll.search({"q": "number3", "query_by": "title",
                       "num_typos": "0", "prefix": "false"})
    assert res["found"] == 0
    assert coll._engine is main_engine  # only the live bit flipped
    res = coll.search({"q": "base", "query_by": "title", "per_page": 30})
    assert res["found"] == 19


def test_filter_applies_to_delta(coll):
    coll.add({"id": "d9", "title": "base doc delta", "points": 42})
    res = coll.search({"q": "base", "query_by": "title",
                       "filter_by": "points:42"})
    assert ids(res) == ["d9"]


def test_compaction_threshold(coll):
    # pushing past the threshold folds delta into a fresh main segment
    for i in range(300):
        coll.add({"id": f"bulk{i}", "title": f"bulk item {i}", "points": i})
    assert coll._dirty
    res = coll.search({"q": "bulk", "query_by": "title", "per_page": 1})
    assert res["found"] == 300
    assert coll._delta_start == coll.next_seq_id
    assert coll._delta_engine is None


def test_update_of_main_doc_triggers_rebuild(coll):
    coll.add({"id": "5", "title": "base doc number5 edited", "points": 5},
             operation="upsert")
    res = coll.search({"q": "edited", "query_by": "title"})
    assert ids(res) == ["5"]


def test_string_sort_across_segments():
    """Regression (round-1 VERDICT weak #4): per-segment ordinal string-sort
    ranks compared numerically across main+delta gave wrong lexicographic
    order. Ranks must be cross-segment comparable."""
    c = Collection("ssort", [
        Field("title", "string"),
        Field("name", "string", sort=True),
    ])
    mains = ["banana", "dragonfruit", "fig", "kiwi", "mango", "papaya"]
    for i, n in enumerate(mains):
        c.add({"id": f"m{i}", "title": "common token", "name": n})
    c._ensure_index()
    deltas = ["apple", "cherry", "grape", "lemon", "nectarine", "quince"]
    for i, n in enumerate(deltas):
        c.add({"id": f"d{i}", "title": "common token", "name": n})
    assert c._delta_start < c.next_seq_id  # delta really exists
    res = c.search({"q": "common", "query_by": "title",
                    "sort_by": "name:asc", "per_page": 20,
                    "num_typos": "0", "prefix": "false"})
    got = [h["document"]["name"] for h in res["hits"]]
    assert got == sorted(mains + deltas), got
    res = c.search({"q": "common", "query_by": "title",
                    "sort_by": "name:desc", "per_page": 20,
                    "num_typos": "0", "prefix": "false"})
    got = [h["document"]["name"] for h in res["hits"]]
    assert got == sorted(mains + deltas, reverse=True), got


def test_string_sort_delta_interleave_dense():
    """Many delta values interleaving between adjacent main values must keep
    strict order (gap bisection)."""
    c = Collection("ssort2", [
        Field("title", "string"),
        Field("name", "string", sort=True),
    ])
    c.add({"id": "a", "title": "tok", "name": "aa"})
    c.add({"id": "z", "title": "tok", "name": "zz"})
    c._ensure_index()
    names = [f"m{chr(ord('a') + i)}" for i in range(10)]  # ma..mj between
    for i, n in enumerate(names):
        c.add({"id": f"d{i}", "title": "tok", "name": n})
    res = c.search({"q": "tok", "query_by": "title", "sort_by": "name:asc",
                    "per_page": 20, "num_typos": "0", "prefix": "false"})
    got = [h["document"]["name"] for h in res["hits"]]
    assert got == sorted(["aa", "zz"] + names), got


def test_facet_counts_exact_above_16_values():
    """Regression (round-1 VERDICT weak #5): facet counting silently capped
    at 16 values per doc."""
    c = Collection("fac", [
        Field("title", "string"),
        Field("tags", "string[]", facet=True),
    ])
    tags = [f"tag{i:02d}" for i in range(25)]
    c.add({"id": "big", "title": "facet stress doc", "tags": tags})
    c.add({"id": "small", "title": "facet stress doc", "tags": ["tag24"]})
    res = c.search({"q": "facet", "query_by": "title", "facet_by": "tags",
                    "max_facet_values": 30, "num_typos": "0",
                    "prefix": "false"})
    counts = {f["value"]: f["count"] for f in res["facet_counts"][0]["counts"]}
    assert len(counts) == 25, len(counts)
    for i in range(24):
        assert counts[f"tag{i:02d}"] == 1
    assert counts["tag24"] == 2


def test_rand_sort_consistent_across_segments():
    """_rand(seed) keys must be a function of (seed, doc) only, not of the
    segment size, so merged ordering is stable."""
    c = Collection("rnd", [Field("title", "string")])
    for i in range(8):
        c.add({"id": f"m{i}", "title": "tok"})
    c._ensure_index()
    for i in range(4):
        c.add({"id": f"d{i}", "title": "tok"})
    r1 = c.search({"q": "tok", "query_by": "title",
                   "sort_by": "_rand(42):asc", "per_page": 20,
                   "num_typos": "0", "prefix": "false"})
    order1 = [h["document"]["id"] for h in r1["hits"]]
    # compact and re-search: same seed must give the same global order
    c._dirty = True
    r2 = c.search({"q": "tok", "query_by": "title",
                   "sort_by": "_rand(42):asc", "per_page": 20,
                   "num_typos": "0", "prefix": "false"})
    order2 = [h["document"]["id"] for h in r2["hits"]]
    assert order1 == order2
    assert len(order1) == 12


def test_update_main_segment_doc_relocates_without_rebuild():
    """Updating a doc that lives in the MAIN segment must NOT force a full
    rebuild: the doc is tombstoned there and reinserted into the delta
    (reference mutates postings in place, src/index.cpp remove+add)."""
    c = Collection("upd", [Field("title", "string"),
                           Field("points", "int32")])
    for i in range(20):
        c.add({"id": f"d{i}", "title": f"alpha item{i}", "points": i})
    c._ensure_index()
    assert not c._dirty
    c.add({"id": "d3", "title": "bravo replacement", "points": 99},
          operation="upsert")
    assert not c._dirty, "main-segment update must not mark a full rebuild"
    # old content gone, new content findable, no duplicate
    r = c.search({"q": "alpha", "query_by": "title", "per_page": 30,
                  "num_typos": "0", "prefix": "false"})
    ids = [h["document"]["id"] for h in r["hits"]]
    assert "d3" not in ids and len(ids) == 19
    r2 = c.search({"q": "bravo", "query_by": "title", "per_page": 10,
                   "num_typos": "0", "prefix": "false"})
    assert [h["document"]["id"] for h in r2["hits"]] == ["d3"]
    assert r2["hits"][0]["document"]["points"] == 99
    # partial update merges remaining fields
    c.add({"id": "d3", "points": 7}, operation="update")
    r3 = c.search({"q": "bravo", "query_by": "title", "per_page": 10,
                   "num_typos": "0", "prefix": "false"})
    assert r3["hits"][0]["document"]["points"] == 7
    assert r3["out_of"] == 20


def test_update_relocation_persists_across_store_reload(tmp_path):
    from typesense_tpu.core.store import Store
    store = Store(str(tmp_path / "s"))
    c = Collection("upd2", [Field("title", "string")], store=store)
    for i in range(10):
        c.add({"id": f"d{i}", "title": f"tok{i}"})
    c._ensure_index()
    c.add({"id": "d5", "title": "fresh"}, operation="upsert")
    store2 = Store(str(tmp_path / "s2"))
    store.create_check_point(str(tmp_path / "s2"))
    store2.reload(str(tmp_path / "s2"))
    c2 = Collection("upd2", [Field("title", "string")], store=store2)
    c2.collection_id = c.collection_id
    c2.load_from_store()
    assert c2.num_documents == 10
    assert c2.get("d5")["title"] == "fresh"
