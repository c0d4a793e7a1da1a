"""Auth tests: key ACLs + scoped HMAC keys with embedded params
(reference: auth_manager_test.cpp, auth_manager.cpp:259-295)."""

import time

import pytest

from typesense_tpu.api.auth import AuthManager
from typesense_tpu.core.errors import Unauthorized


@pytest.fixture()
def auth():
    a = AuthManager(store=None, bootstrap_key="rootkey123456789")
    return a


def test_bootstrap_key(auth):
    assert auth.authenticate("rootkey123456789", "collections:create", []) == {}
    with pytest.raises(Unauthorized):
        auth.authenticate("wrong", "collections:create", [])
    with pytest.raises(Unauthorized):
        auth.authenticate("", "collections:create", [])


def test_key_acl(auth):
    k = auth.create_key({"description": "search only",
                         "actions": ["documents:search"],
                         "collections": ["products"]})
    assert auth.authenticate(k.value, "documents:search", ["products"]) == {}
    with pytest.raises(Unauthorized):
        auth.authenticate(k.value, "documents:create", ["products"])
    with pytest.raises(Unauthorized):
        auth.authenticate(k.value, "documents:search", ["orders"])


def test_key_expiry(auth):
    k = auth.create_key({"actions": ["*"], "collections": ["*"],
                         "expires_at": int(time.time()) - 10})
    with pytest.raises(Unauthorized):
        auth.authenticate(k.value, "documents:search", ["x"])


def test_scoped_key_embeds_params(auth):
    parent = auth.create_key({"actions": ["documents:search"],
                              "collections": ["*"]})
    scoped = AuthManager.generate_scoped_key(
        parent.value, {"filter_by": "brand:acme", "per_page": 5})
    params = auth.authenticate(scoped, "documents:search", ["products"])
    assert params["filter_by"] == "brand:acme"
    assert params["per_page"] == 5
    # scoped keys are search-only
    with pytest.raises(Unauthorized):
        auth.authenticate(scoped, "documents:create", ["products"])


def test_scoped_key_tamper_rejected(auth):
    import base64
    parent = auth.create_key({"actions": ["documents:search"],
                              "collections": ["*"]})
    scoped = AuthManager.generate_scoped_key(parent.value,
                                             {"filter_by": "brand:acme"})
    raw = base64.b64decode(scoped).decode()
    tampered = base64.b64encode(
        raw.replace("brand:acme", "brand:evil").encode()).decode()
    with pytest.raises(Unauthorized):
        auth.authenticate(tampered, "documents:search", ["x"])


def test_scoped_key_expiry(auth):
    parent = auth.create_key({"actions": ["documents:search"],
                              "collections": ["*"]})
    scoped = AuthManager.generate_scoped_key(
        parent.value, {"expires_at": int(time.time()) - 5})
    with pytest.raises(Unauthorized):
        auth.authenticate(scoped, "documents:search", ["x"])
