"""Bearer-token validation (Q6, SURVEY.md §2.11) — the reference's
``shared/auth/jwt_validator.py`` semantics, stdlib-only.

The reference explicitly decodes WITHOUT signature verification
(ref jwt_validator.py:44-60: ``jwt.decode(..., verify_signature=False)``)
— it is a claims extractor + tenant gate, not a cryptographic check — so
the PyJWT dependency reduces to base64url + JSON: split the compact
serialization, decode the payload segment, validate ``tid``, return the
same user-info dict. Error behavior mirrors the reference: every failure
raises ``ValueError`` with the same message shapes (missing header, bad
prefix, decode failure, tenant mismatch)."""

from __future__ import annotations

import base64
import json
from typing import Any, Dict


def _b64url_json(segment: str) -> dict:
    pad = "=" * (-len(segment) % 4)
    return json.loads(base64.urlsafe_b64decode(segment + pad))


def decode_unverified(token: str) -> dict:
    """Payload claims of a compact JWT, no signature verification —
    the stdlib equivalent of ref jwt_validator.py:56."""
    parts = token.split(".")
    if len(parts) != 3:
        raise ValueError("Not enough segments")
    return _b64url_json(parts[1])


def validate_bearer_token(
    authorization_header: str, expected_tenant_id: str
) -> Dict[str, Any]:
    """ref jwt_validator.py:39-69 — Bearer prefix gate, unverified
    decode, tenant check, user-info extraction (oid / unique_name|upn|
    preferred_username / tid / appid)."""
    if not authorization_header:
        raise ValueError("Missing Authorization header")
    if not authorization_header.startswith("Bearer "):
        raise ValueError(
            "Invalid Authorization header format. Must start with 'Bearer '"
        )
    token = authorization_header[7:]
    try:
        payload = decode_unverified(token)
        token_tenant = payload.get("tid")
        if token_tenant != expected_tenant_id:
            raise ValueError(
                f"Token tenant {token_tenant} doesn't match expected "
                f"{expected_tenant_id}"
            )
        return {
            "user_id": payload.get("oid"),
            "username": payload.get("unique_name")
            or payload.get("upn")
            or payload.get("preferred_username"),
            "tenant_id": payload.get("tid"),
            "app_id": payload.get("appid"),
        }
    except Exception as e:  # ref :66-69 — everything wraps to ValueError
        raise ValueError(f"Token decode failed: {e}") from e


class AzureTokenValidator:
    """ref jwt_validator.py:7-37 — class form holding the tenant id."""

    def __init__(self, expected_tenant_id: str):
        self.expected_tenant_id = expected_tenant_id

    def validate_token(self, authorization_header: str) -> Dict[str, Any]:
        return validate_bearer_token(authorization_header, self.expected_tenant_id)
