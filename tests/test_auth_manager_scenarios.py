"""Auth manager scenarios ported from the reference suite
(/root/reference/test/auth_manager_test.cpp: CreateListDeleteAPIKeys,
CheckRestoreOfAPIKeys, VerifyAuthentication, ScopedAPIKeys,
ValidateBadKeyProperties, AutoDeleteKeysOnExpiry, CollectionsByScope):
key CRUD + masking, persistence restore, ACL matching with wildcards and
prefix patterns, expiry, and scoped (embedded-params) key verification."""

import time

import pytest

from typesense_tpu.api.auth import AuthManager
from typesense_tpu.core.errors import BadRequest, NotFound, Unauthorized


@pytest.fixture()
def am():
    return AuthManager(bootstrap_key="bootstrap")


def _mk(am, actions, collections, **kw):
    return am.create_key({"description": "d", "actions": actions,
                          "collections": collections, **kw})


# ---- CRUD + masking (CreateListDeleteAPIKeys) ----

def test_create_key_assigns_ids(am):
    a = _mk(am, ["*"], ["*"])
    b = _mk(am, ["*"], ["*"])
    assert b.id == a.id + 1


def test_list_keys_masks_value(am):
    k = _mk(am, ["*"], ["*"])
    out = am.list_keys()[0]
    assert "value" not in out
    assert k.value.startswith(out["value_prefix"])
    assert len(out["value_prefix"]) < len(k.value)


def test_get_key_by_id(am):
    k = _mk(am, ["documents:search"], ["products"])
    got = am.get_key(k.id)
    assert got.actions == ["documents:search"]
    with pytest.raises(NotFound):
        am.get_key(999)


def test_delete_key(am):
    k = _mk(am, ["*"], ["*"])
    am.delete_key(k.id)
    assert am.list_keys() == []
    with pytest.raises(NotFound):
        am.delete_key(k.id)


def test_create_key_with_explicit_value(am):
    k = _mk(am, ["*"], ["*"], value="myfixedkey123")
    assert k.value == "myfixedkey123"
    am.authenticate("myfixedkey123", "documents:search", ["c"])


# ---- validation (ValidateBadKeyProperties) ----

def test_actions_must_be_string_array(am):
    with pytest.raises(BadRequest):
        am.create_key({"actions": "not-a-list", "collections": ["*"]})
    with pytest.raises(BadRequest):
        am.create_key({"actions": [1, 2], "collections": ["*"]})


def test_collections_must_be_string_array(am):
    with pytest.raises(BadRequest):
        am.create_key({"actions": ["*"], "collections": 42})


def test_description_must_be_string(am):
    with pytest.raises(BadRequest):
        am.create_key({"description": 123, "actions": ["*"],
                       "collections": ["*"]})


def test_missing_actions_rejected(am):
    with pytest.raises(BadRequest):
        am.create_key({"collections": ["*"]})


# ---- authentication ACL (VerifyAuthentication, CollectionsByScope) ----

def test_bootstrap_key_allows_everything(am):
    assert am.authenticate("bootstrap", "collections:delete", ["x"]) == {}


def test_missing_key_rejected(am):
    with pytest.raises(Unauthorized):
        am.authenticate("", "documents:search", ["c"])


def test_unknown_key_rejected(am):
    with pytest.raises(Unauthorized):
        am.authenticate("nope", "documents:search", ["c"])


def test_action_scoping(am):
    _mk(am, ["documents:search"], ["*"], value="searchonly")
    am.authenticate("searchonly", "documents:search", ["c"])
    with pytest.raises(Unauthorized):
        am.authenticate("searchonly", "documents:create", ["c"])


def test_action_wildcard_category(am):
    _mk(am, ["documents:*"], ["*"], value="docsall")
    am.authenticate("docsall", "documents:create", ["c"])
    with pytest.raises(Unauthorized):
        am.authenticate("docsall", "collections:delete", ["c"])


def test_collection_scoping(am):
    _mk(am, ["*"], ["products"], value="prodkey")
    am.authenticate("prodkey", "documents:search", ["products"])
    with pytest.raises(Unauthorized):
        am.authenticate("prodkey", "documents:search", ["orders"])


def test_collection_prefix_pattern(am):
    _mk(am, ["*"], ["shop_*"], value="shopkey")
    am.authenticate("shopkey", "documents:search", ["shop_eu"])
    am.authenticate("shopkey", "documents:search", ["shop_us"])
    with pytest.raises(Unauthorized):
        am.authenticate("shopkey", "documents:search", ["admin"])


# ---- expiry (AutoDeleteKeysOnExpiry) ----

def test_expired_key_rejected(am):
    _mk(am, ["*"], ["*"], value="oldkey",
        expires_at=int(time.time()) - 10)
    with pytest.raises(Unauthorized):
        am.authenticate("oldkey", "documents:search", ["c"])


def test_future_expiry_ok(am):
    _mk(am, ["*"], ["*"], value="freshkey",
        expires_at=int(time.time()) + 3600)
    am.authenticate("freshkey", "documents:search", ["c"])


# ---- scoped keys (ScopedAPIKeys) ----

def test_scoped_key_embeds_params(am):
    _mk(am, ["documents:search"], ["*"], value="parentparentparent")
    scoped = AuthManager.generate_scoped_key(
        "parentparentparent", {"filter_by": "user_id:=u42"})
    params = am.authenticate(scoped, "documents:search", ["c"])
    assert params == {"filter_by": "user_id:=u42"}


def test_scoped_key_search_only(am):
    _mk(am, ["*"], ["*"], value="parentparentparent")
    scoped = AuthManager.generate_scoped_key(
        "parentparentparent", {"filter_by": "x:=1"})
    with pytest.raises(Unauthorized):
        am.authenticate(scoped, "documents:create", ["c"])


def test_scoped_key_tamper_rejected(am):
    _mk(am, ["documents:search"], ["*"], value="parentparentparent")
    scoped = AuthManager.generate_scoped_key(
        "parentparentparent", {"filter_by": "user_id:=u42"})
    import base64
    raw = base64.b64decode(scoped).decode()
    forged = base64.b64encode(
        raw.replace("u42", "u43").encode()).decode()
    with pytest.raises(Unauthorized):
        am.authenticate(forged, "documents:search", ["c"])


def test_scoped_key_from_deleted_parent_rejected(am):
    k = _mk(am, ["documents:search"], ["*"], value="parentparentparent")
    scoped = AuthManager.generate_scoped_key(
        "parentparentparent", {"filter_by": "a:=1"})
    am.delete_key(k.id)
    with pytest.raises(Unauthorized):
        am.authenticate(scoped, "documents:search", ["c"])


# ---- persistence restore (CheckRestoreOfAPIKeys) ----

def test_keys_restore_from_store(tmp_store):
    a1 = AuthManager(store=tmp_store)
    k = a1.create_key({"actions": ["documents:search"],
                       "collections": ["products"], "value": "persisted"})
    a2 = AuthManager(store=tmp_store)
    a2.load()
    assert a2.get_key(k.id).value == "persisted"
    a2.authenticate("persisted", "documents:search", ["products"])
    assert a2.next_id == k.id + 1


def test_deleted_key_not_restored(tmp_store):
    a1 = AuthManager(store=tmp_store)
    k = a1.create_key({"actions": ["*"], "collections": ["*"],
                       "value": "gone"})
    a1.delete_key(k.id)
    a2 = AuthManager(store=tmp_store)
    a2.load()
    assert a2.list_keys() == []
