"""Typed errors mirroring the reference's Option<T>/HTTP status model.

Reference: /root/reference/include/option.h (Option<T> carries code+error),
HTTP codes used by handlers in /root/reference/src/core_api.cpp.
"""

from __future__ import annotations


class TypesenseError(Exception):
    """Base error carrying an HTTP status code, like Option<T>'s error path."""

    http_code = 500

    def __init__(self, message: str, http_code: int | None = None):
        super().__init__(message)
        self.message = message
        if http_code is not None:
            self.http_code = http_code

    def to_json(self) -> dict:
        return {"message": self.message}


class BadRequest(TypesenseError):
    http_code = 400


class Unauthorized(TypesenseError):
    http_code = 401


class Forbidden(TypesenseError):
    http_code = 403


class NotFound(TypesenseError):
    http_code = 404


class Conflict(TypesenseError):
    http_code = 409


class UnprocessableEntity(TypesenseError):
    http_code = 422


class TooManyRequests(TypesenseError):
    http_code = 429


class ServiceUnavailable(TypesenseError):
    http_code = 503
