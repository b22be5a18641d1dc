"""Q6 bearer-token validation — ref shared/auth/jwt_validator.py:7-69
(unverified decode, tenant gate, user-info extraction, error wrapping)."""

from __future__ import annotations

import base64
import json

import pytest

from azure_blob_crawler_ray.functions.auth import (
    AzureTokenValidator,
    validate_bearer_token,
)

TENANT = "11111111-2222-3333-4444-555555555555"


def _jwt(payload: dict) -> str:
    def seg(obj) -> str:
        return base64.urlsafe_b64encode(json.dumps(obj).encode()).decode().rstrip("=")

    return f"{seg({'alg': 'none', 'typ': 'JWT'})}.{seg(payload)}.sig"


def test_happy_path_extracts_user_info():
    tok = _jwt({"tid": TENANT, "oid": "u-1", "unique_name": "alice@x", "appid": "app-9"})
    info = validate_bearer_token(f"Bearer {tok}", TENANT)
    assert info == {
        "user_id": "u-1",
        "username": "alice@x",
        "tenant_id": TENANT,
        "app_id": "app-9",
    }


def test_username_fallback_chain():
    # ref :62 — unique_name, then upn, then preferred_username
    assert (
        validate_bearer_token(f"Bearer {_jwt({'tid': TENANT, 'upn': 'bob'})}", TENANT)[
            "username"
        ]
        == "bob"
    )
    assert (
        validate_bearer_token(
            f"Bearer {_jwt({'tid': TENANT, 'preferred_username': 'carol'})}", TENANT
        )["username"]
        == "carol"
    )


def test_header_gates():
    with pytest.raises(ValueError, match="Missing Authorization header"):
        validate_bearer_token("", TENANT)
    with pytest.raises(ValueError, match="Must start with 'Bearer '"):
        validate_bearer_token("Basic abc", TENANT)


def test_tenant_mismatch_is_wrapped():
    # the reference raises inside its try, so the message is wrapped
    # into 'Token decode failed: ...' (ref :57-69)
    tok = _jwt({"tid": "other-tenant"})
    with pytest.raises(ValueError, match="Token decode failed: Token tenant other-tenant"):
        validate_bearer_token(f"Bearer {tok}", TENANT)


def test_garbage_token_wrapped():
    with pytest.raises(ValueError, match="Token decode failed"):
        validate_bearer_token("Bearer not.a.jwt", TENANT)
    with pytest.raises(ValueError, match="Token decode failed"):
        validate_bearer_token("Bearer nosegments", TENANT)


def test_class_form():
    v = AzureTokenValidator(TENANT)
    tok = _jwt({"tid": TENANT, "oid": "u-2"})
    assert v.validate_token(f"Bearer {tok}")["user_id"] == "u-2"
