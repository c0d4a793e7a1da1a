"""Schema-change scenario family — reference
collection_schema_change_test.cpp: add/drop/retype fields on a live
collection, reindex semantics, persistence of the altered schema, errors."""

import pytest

from tests.test_http_api import call, make_server
from typesense_tpu.core.store import Store


@pytest.fixture()
def env(tmp_path):
    store = Store(str(tmp_path / "db"))
    s = make_server(store)
    call(s, "POST", "/collections", body={
        "name": "items",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "price", "type": "int32"}]})
    for i, (t, p, c) in enumerate([("red shoes", 10, "a"),
                                   ("blue shoes", 20, "b"),
                                   ("green hat", 30, "a")]):
        call(s, "POST", "/collections/items/documents",
             body={"id": str(i), "title": t, "price": p, "color": c})
    return s, store, tmp_path


def search(s, q, **kw):
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": q, "query_by": "title", **kw})
    return code, res


def test_add_field_makes_existing_docs_searchable(env):
    s, _, _ = env
    # color was stored with the docs but not indexed; adding the field
    # reindexes existing documents (alter ADD, schema_change_test)
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "color", "type": "string", "facet": True}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": "a", "query_by": "color",
                            "facet_by": "color"})
    assert code == 200 and res["found"] == 2
    fc = {c["value"]: c["count"] for c in res["facet_counts"][0]["counts"]}
    assert fc == {"a": 2}


def test_drop_field_stops_search(env):
    s, _, _ = env
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "title", "drop": True}]})
    assert code == 200
    code, res = search(s, "shoes")
    assert code == 404 and "title" in res["message"]


def test_drop_unknown_field_errors(env):
    s, _, _ = env
    code, res = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "nope", "drop": True}]})
    assert code == 400


def test_retype_field_facet_toggle(env):
    s, _, _ = env
    # modifying in place is rejected; drop + re-add in one alter is the
    # supported path (collection_schema_change_test.cpp AlterValidations /
    # AbilityToDropAndReAddIndexAtTheSameTime)
    code, res = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "price", "type": "int32", "facet": True}]})
    assert code == 400
    assert "drop it first" in res["message"]
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "price", "drop": True},
                   {"name": "price", "type": "int32", "facet": True}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": "*", "facet_by": "price"})
    assert code == 200
    counts = res["facet_counts"][0]["counts"]
    assert sum(c["count"] for c in counts) == 3


def test_alter_persists_across_restart(env):
    s, store, tmp_path = env
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "color", "type": "string", "facet": True}]})
    assert code == 200
    # new manager over the same store = process restart
    s2 = make_server(store)
    code, res = call(s2, "GET", "/collections/items")
    assert code == 200
    names = {f["name"] for f in res["fields"]}
    assert "color" in names
    code, res = call(s2, "GET", "/collections/items/documents/search",
                     query={"q": "b", "query_by": "color"})
    assert code == 200 and res["found"] == 1


def test_new_docs_use_altered_schema(env):
    s, _, _ = env
    call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "color", "type": "string"}]})
    call(s, "POST", "/collections/items/documents",
         body={"id": "9", "title": "purple scarf", "price": 5,
               "color": "purple"})
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": "purple", "query_by": "color"})
    assert code == 200 and res["found"] == 1


def test_sort_on_newly_added_numeric(env):
    s, _, _ = env
    call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "rank", "type": "int32", "optional": True}]})
    for i, r in [("0", 3), ("1", 1), ("2", 2)]:
        call(s, "PATCH", f"/collections/items/documents/{i}",
             body={"rank": r})
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": "*", "sort_by": "rank:asc"})
    assert code == 200
    ranks = [h["document"]["rank"] for h in res["hits"]]
    assert ranks == sorted(ranks)


def test_alter_requires_fields_key(env):
    s, _, _ = env
    code, res = call(s, "PATCH", "/collections/items",
                     body={"name": "renamed"})
    assert code == 400


def test_alter_bad_field_format_rejected(env):
    """AlterValidations (collection_schema_change_test.cpp:368): wrong key."""
    s, _, _ = env
    code, res = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "age", "typezzz": "int32"}]})
    assert code == 400
    assert "Wrong format for `fields`" in res["message"]


def test_alter_order_of_drop_does_not_matter(env):
    """OrderOfDropShouldNotMatter (…:1050): re-add listed BEFORE the drop of
    the same field in one alter still works."""
    s, _, _ = env
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "price", "type": "float"},
                   {"name": "price", "drop": True}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/items")
    types = {f["name"]: f["type"] for f in res["fields"]}
    assert types["price"] == "float"


def test_alter_add_and_drop_immediately(env):
    """AddAndDropFieldImmediately (…:610): two sequential alters."""
    s, _, _ = env
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "color", "type": "string", "facet": True}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": "*", "facet_by": "color"})
    assert code == 200 and res["facet_counts"][0]["counts"]
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "color", "drop": True}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": "*", "facet_by": "color"})
    assert code == 404


def test_alter_drop_field_not_in_documents(env):
    """DropFieldNotExistingInDocuments (…:819): dropping an optional field
    no document carries succeeds."""
    s, _, _ = env
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "ghost", "type": "string", "optional": True}]})
    assert code == 200
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "ghost", "drop": True}]})
    assert code == 200


def test_alter_change_to_coercible_type(env):
    """ChangeFieldToCoercableTypeIsAllowed (…:842): int32 -> string via
    drop+re-add, existing int values coerce on reindex."""
    s, _, _ = env
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "price", "drop": True},
                   {"name": "price", "type": "string"}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": "10", "query_by": "price"})
    assert code == 200 and res["found"] == 1


def test_drop_embed_source_prunes_from_list(tmp_path):
    """Dropping a source field removes it from dependent embed `from`
    lists; dropping the LAST source drops the embed field itself
    (schema_change_test.cpp DropFieldUsedForEmbedding)."""
    store = Store(str(tmp_path / "db2"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "objects",
        "fields": [
            {"name": "title", "type": "string"},
            {"name": "names", "type": "string[]"},
            {"name": "category", "type": "string"},
            {"name": "embedding", "type": "float[]",
             "embed": {"from": ["names", "category"],
                       "model_config": {"model_name": "ts/ts-mini"}}},
            {"name": "embedding2", "type": "float[]",
             "embed": {"from": ["names"],
                       "model_config": {"model_name": "ts/ts-mini"}}}]})
    assert code == 201
    code, _ = call(s, "PATCH", "/collections/objects", body={
        "fields": [{"name": "names", "drop": True}]})
    assert code == 200
    coll = s.manager.get_collection("objects")
    # embedding keeps category as its only source; embedding2 dropped
    assert coll.field_map["embedding"].embed["from"] == ["category"]
    assert "embedding2" not in coll.field_map
    code, _ = call(s, "PATCH", "/collections/objects", body={
        "fields": [{"name": "category", "drop": True}]})
    assert code == 200
    assert "embedding" not in coll.field_map
    assert [f.name for f in coll.fields] == ["title"]


def test_alter_add_embedding_field_embeds_existing_docs(tmp_path):
    """Adding an auto-embed field via alter backfills embeddings for
    existing documents (schema_change_test.cpp
    UpdateSchemaWithNewEmbeddingField)."""
    import os
    ckpt = os.path.join(os.path.dirname(
        __import__("typesense_tpu.models.embedder",
                   fromlist=["x"]).__file__),
        "checkpoints", "ts_ts-mini.npz")
    if not os.path.exists(ckpt):
        pytest.skip("ts-mini checkpoint not built")
    store = Store(str(tmp_path / "db3"))
    s = make_server(store)
    call(s, "POST", "/collections", body={
        "name": "emb", "fields": [{"name": "title", "type": "string"}]})
    call(s, "POST", "/collections/emb/documents",
         body={"id": "0", "title": "chicken casserole"})
    call(s, "POST", "/collections/emb/documents",
         body={"id": "1", "title": "bicycle repair"})
    code, _ = call(s, "PATCH", "/collections/emb", body={
        "fields": [{"name": "vec", "type": "float[]",
                    "embed": {"from": ["title"],
                              "model_config": {"model_name": "ts/ts-mini"}}}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/emb/documents/search",
                     query={"q": "poultry stew", "query_by": "vec",
                            "per_page": 1})
    assert code == 200, res
    assert res["hits"][0]["document"]["id"] == "0"


def test_alter_index_false_to_true(env):
    """A stored-but-unindexed field becomes searchable after drop +
    re-add with index: true (schema_change_test.cpp IndexFalseToTrue)."""
    s, _, _ = env
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "color", "type": "string", "index": False}]})
    assert code == 200
    code, _ = call(s, "PATCH", "/collections/items", body={
        "fields": [{"name": "color", "drop": True},
                   {"name": "color", "type": "string", "index": True}]})
    assert code == 200
    code, res = call(s, "GET", "/collections/items/documents/search",
                     query={"q": "a", "query_by": "color"})
    assert code == 200
    assert res["found"] == 2


def test_alter_added_embed_field_with_dangling_source_rejected(tmp_path):
    """An embed field ADDED in an alter whose `from` references a field
    dropped in the same alter (or never present) is rejected — otherwise
    later document indexing fails on the missing source (reference alter
    validation)."""
    store = Store(str(tmp_path / "db3"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "dangled",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "notes", "type": "string"}]})
    assert code == 201
    # from references a field dropped in the SAME alter
    code, res = call(s, "PATCH", "/collections/dangled", body={
        "fields": [{"name": "notes", "drop": True},
                   {"name": "emb", "type": "float[]",
                    "embed": {"from": ["notes"],
                              "model_config": {"model_name": "ts/ts-mini"}}}]})
    assert code == 400
    assert "does not exist" in res["message"]
    # from references a never-present field
    code, res = call(s, "PATCH", "/collections/dangled", body={
        "fields": [{"name": "emb", "type": "float[]",
                    "embed": {"from": ["ghost"],
                              "model_config": {"model_name": "ts/ts-mini"}}}]})
    assert code == 400
    # drop+re-add of the source in the same alter is FINE
    code, res = call(s, "PATCH", "/collections/dangled", body={
        "fields": [{"name": "title", "drop": True},
                   {"name": "title", "type": "string"}]})
    assert code == 200, res


def test_drop_specific_dynamic_materialized_field(tmp_path):
    """Dropping one field that a dynamic pattern materialized keeps the
    pattern itself alive for future docs
    (collection_schema_change_test.cpp DropSpecificDynamicField)."""
    store = Store(str(tmp_path / "dyn"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "dyn",
        "fields": [{"name": ".*_int", "type": "int32", "facet": True}]})
    assert code == 201
    code, _ = call(s, "POST", "/collections/dyn/documents",
                   body={"id": "0", "quantity_int": 1000})
    assert code == 201
    code, _ = call(s, "PATCH", "/collections/dyn", body={
        "fields": [{"name": "quantity_int", "drop": True}]})
    assert code == 200
    # the pattern still matches new docs
    code, _ = call(s, "POST", "/collections/dyn/documents",
                   body={"id": "1", "year_int": 2020})
    assert code == 201
    code, res = call(s, "GET", "/collections/dyn/documents/search",
                     query={"q": "*", "query_by": "",
                            "filter_by": "year_int:2020"})
    assert code == 200 and res["found"] == 1


def test_add_dynamic_field_matching_multiple_fields(tmp_path):
    """Alter-adding `.*_int` indexes every stored field the pattern matches
    (collection_schema_change_test.cpp AddDynamicFieldMatchingMultipleFields)."""
    store = Store(str(tmp_path / "dyn2"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "dyn2",
        "fields": [{"name": "title", "type": "string"},
                   {"name": "points", "type": "int32"}]})
    assert code == 201
    code, _ = call(s, "POST", "/collections/dyn2/documents",
                   body={"id": "0", "title": "The quick brown fox",
                         "points": 100, "quantity_int": 1000,
                         "year_int": 2020})
    assert code == 201
    code, _ = call(s, "PATCH", "/collections/dyn2", body={
        "fields": [{"name": ".*_int", "type": "int32", "optional": True}]})
    assert code == 200
    for fexpr in ("quantity_int:1000", "year_int:2020"):
        code, res = call(s, "GET", "/collections/dyn2/documents/search",
                         query={"q": "*", "query_by": "",
                                "filter_by": fexpr})
        assert code == 200 and res["found"] == 1, (fexpr, res)


def test_alter_primitive_to_string_star_and_back(tmp_path):
    """string -> string* -> string round-trip keeps the data searchable
    (collection_schema_change_test.cpp ChangeFromPrimitiveToDynamicField)."""
    store = Store(str(tmp_path / "star"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "star",
        "fields": [{"name": "tags", "type": "string"}]})
    assert code == 201
    code, _ = call(s, "POST", "/collections/star/documents",
                   body={"id": "0", "tags": "123"})
    assert code == 201
    for new_type in ("string*", "string"):
        code, res = call(s, "PATCH", "/collections/star", body={
            "fields": [{"name": "tags", "drop": True},
                       {"name": "tags", "type": new_type, "facet": True}]})
        assert code == 200, res
        code, res = call(s, "GET", "/collections/star/documents/search",
                         query={"q": "123", "query_by": "tags"})
        assert code == 200 and res["found"] == 1, (new_type, res)


def test_alter_primitive_to_auto_and_back(tmp_path):
    """string -> auto -> string round-trip
    (collection_schema_change_test.cpp ChangeFromPrimitiveToAutoField)."""
    store = Store(str(tmp_path / "auto"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "aut",
        "fields": [{"name": "tags", "type": "string"}]})
    assert code == 201
    code, _ = call(s, "POST", "/collections/aut/documents",
                   body={"id": "0", "tags": "123"})
    assert code == 201
    for new_type in ("auto", "string"):
        code, res = call(s, "PATCH", "/collections/aut", body={
            "fields": [{"name": "tags", "drop": True},
                       {"name": "tags", "type": new_type}]})
        assert code == 200, res
        code, res = call(s, "GET", "/collections/aut/documents/search",
                         query={"q": "123", "query_by": "tags"})
        assert code == 200 and res["found"] == 1, (new_type, res)


def test_drop_geopoint_array_add_optional_replacement(tmp_path):
    """Dropping a geopoint[] field while adding an optional replacement in
    one alter succeeds (collection_schema_change_test.cpp
    DropGeoPointArrayField)."""
    store = Store(str(tmp_path / "geo"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "geoc",
        "fields": [{"name": "geoloc", "type": "geopoint[]"}]})
    assert code == 201
    for i in range(2):
        code, _ = call(s, "POST", "/collections/geoc/documents",
                       body={"id": str(i), "geoloc": [[10, 20]]})
        assert code == 201
    code, res = call(s, "PATCH", "/collections/geoc", body={
        "fields": [{"name": "geoloc", "drop": True},
                   {"name": "_geoloc", "type": "geopoint[]",
                    "optional": True}]})
    assert code == 200, res


def test_add_field_with_existing_null_value_then_upsert(tmp_path):
    """A stored null for a later-added optional field must not poison
    upserts or filtering (collection_schema_change_test.cpp
    AddingFieldWithExistingNullValue)."""
    store = Store(str(tmp_path / "nul"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "nul",
        "fields": [{"name": "title", "type": "string"}]})
    assert code == 201
    code, _ = call(s, "POST", "/collections/nul/documents",
                   body={"id": "0", "title": "Sample Title 1", "num": None})
    assert code == 201
    code, res = call(s, "PATCH", "/collections/nul", body={
        "fields": [{"name": "num", "type": "int32", "optional": True}]})
    assert code == 200, res
    code, _ = call(s, "POST", "/collections/nul/documents",
                   query={"action": "upsert"},
                   body={"id": "0", "title": "Sample Title 1", "num": 100})
    assert code == 201
    code, res = call(s, "GET", "/collections/nul/documents/search",
                     query={"q": "*", "query_by": "",
                            "filter_by": "num:100"})
    assert code == 200 and res["found"] == 1


def test_alter_incompatible_existing_data_rejected(tmp_path):
    """Adding a field whose stored values cannot coerce to the new type is
    rejected atomically; dropping the bad field first unblocks it
    (collection_schema_change_test.cpp DropIntegerFieldAndAddStringValues)."""
    store = Store(str(tmp_path / "mix"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "mix",
        "fields": [{"name": "title", "type": "string"}]})
    assert code == 201
    code, _ = call(s, "POST", "/collections/mix/documents",
                   body={"id": "0", "title": "Foo", "label": "hello"})
    assert code == 201
    # label holds a non-numeric string -> adding it as int32 must fail
    code, res = call(s, "PATCH", "/collections/mix", body={
        "fields": [{"name": "label", "type": "int32", "optional": True}]})
    assert code == 400
    assert "cannot be coerced" in res["message"]
    # schema unchanged by the failed alter (atomicity)
    code, res = call(s, "GET", "/collections/mix")
    assert code == 200
    assert [f["name"] for f in res["fields"]] == ["title"]
    # adding it as string works
    code, res = call(s, "PATCH", "/collections/mix", body={
        "fields": [{"name": "label", "type": "string", "optional": True}]})
    assert code == 200, res
    code, res = call(s, "GET", "/collections/mix/documents/search",
                     query={"q": "hello", "query_by": "label"})
    assert code == 200 and res["found"] == 1


def test_alter_coercible_existing_data_allowed(tmp_path):
    """Numeric strings coerce into an added int field; alter validation
    uses coercion semantics, not strict typing
    (collection_schema_change_test.cpp ChangeFieldToCoercableTypeIsAllowed /
    AlterValidationShouldNotRejectBadValues)."""
    store = Store(str(tmp_path / "coer"))
    s = make_server(store)
    code, _ = call(s, "POST", "/collections", body={
        "name": "coer",
        "fields": [{"name": "title", "type": "string"}]})
    assert code == 201
    code, _ = call(s, "POST", "/collections/coer/documents",
                   body={"id": "0", "title": "Foo", "year": "1999"})
    assert code == 201
    code, res = call(s, "PATCH", "/collections/coer", body={
        "fields": [{"name": "year", "type": "int32", "optional": True}]})
    assert code == 200, res
    code, res = call(s, "GET", "/collections/coer/documents/search",
                     query={"q": "*", "query_by": "",
                            "filter_by": "year:1999"})
    assert code == 200 and res["found"] == 1
