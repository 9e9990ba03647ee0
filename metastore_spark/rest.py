"""Thin HTTP layer: routing, JWT identity, JSONP — reference O14/O15.

Mirrors metastore/blueprint.py: ``GET /metastore/search`` (datasets)
and ``GET /metastore/search/<kind>``; identity from the ``Auth-Token``
header or ``jwt`` query param; an invalid/absent token silently means
anonymous (metastore/blueprint.py:22-29); responses are JSON, or
JSONP when a ``callback`` param is present.

Implementation is a plain WSGI app over the SearchEngine — no web
framework needed; it runs under any WSGI server (gunicorn in the
reference's deployment). JWT HS256 verification is implemented from
RFC 7515/7519 with stdlib hmac; if PyJWT is available it is used
instead (and enables other algorithms).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
from urllib.parse import parse_qs

from metastore_spark.api import SearchEngine


def _b64url_decode(seg: str) -> bytes:
    pad = "=" * (-len(seg) % 4)
    return base64.urlsafe_b64decode(seg + pad)


def decode_jwt(token: str | None, key: str) -> str | None:
    """Return the ``userid`` claim, or None for missing/invalid tokens
    (the reference's silent-anonymous contract)."""
    if not token:
        return None
    try:
        try:
            import jwt as pyjwt  # optional

            payload = pyjwt.decode(token, key, algorithms=["HS256"])
            return payload.get("userid")
        except ImportError:
            pass
        header_b64, payload_b64, sig_b64 = token.split(".")
        header = json.loads(_b64url_decode(header_b64))
        if header.get("alg") != "HS256":
            return None
        signing_input = f"{header_b64}.{payload_b64}".encode()
        want = hmac.new(key.encode(), signing_input, hashlib.sha256).digest()
        if not hmac.compare_digest(want, _b64url_decode(sig_b64)):
            return None
        payload = json.loads(_b64url_decode(payload_b64))
        return payload.get("userid")
    except Exception:
        return None


def encode_jwt(payload: dict, key: str) -> str:
    """HS256 token mint (tests / local tooling)."""
    def enc(obj) -> str:
        raw = json.dumps(obj, separators=(",", ":")).encode()
        return base64.urlsafe_b64encode(raw).rstrip(b"=").decode()

    head = enc({"alg": "HS256", "typ": "JWT"})
    body = enc(payload)
    sig = hmac.new(key.encode(), f"{head}.{body}".encode(), hashlib.sha256).digest()
    return f"{head}.{body}." + base64.urlsafe_b64encode(sig).rstrip(b"=").decode()


def _cors_headers(
    environ, allowed_origins: set[str] | None = None
) -> list[tuple[str, str]]:
    """Reference CORS contract (metastore/__init__.py:13-14:
    ``CORS(app, supports_credentials=True)``): the request's Origin is
    ECHOED — a credentialed response may not use ``*`` — with
    ``Access-Control-Allow-Credentials: true`` and ``Vary: Origin``
    (the echo makes the response origin-dependent for caches). No
    Origin header → not a CORS request → no CORS headers, exactly
    like flask-cors.

    SECURITY (ADVICE r8): echo-any-origin + credentials lets any
    website read JWT-bearing responses cross-origin. That IS the
    reference's deployed behavior, so it stays the default for
    parity, but ``allowed_origins`` (create_app arg or the
    METASTORE_CORS_ORIGINS env var, comma-separated) restricts the
    echo to an allowlist — a non-listed Origin gets NO CORS headers,
    so the browser blocks the cross-origin read."""
    origin = environ.get("HTTP_ORIGIN")
    if not origin:
        return []
    if allowed_origins is not None and origin not in allowed_origins:
        return []
    return [
        ("Access-Control-Allow-Origin", origin),
        ("Access-Control-Allow-Credentials", "true"),
        ("Vary", "Origin"),
    ]


def _resolve_allowed_origins(
    allowed_origins: list[str] | None,
) -> set[str] | None:
    """create_app arg wins; else METASTORE_CORS_ORIGINS (comma-
    separated); else None = reference-parity echo-any."""
    if allowed_origins is not None:
        return set(allowed_origins)
    import os

    env = os.environ.get("METASTORE_CORS_ORIGINS")
    if env:
        return {o.strip() for o in env.split(",") if o.strip()}
    return None


def create_app(
    engine: SearchEngine,
    private_key: str,
    allowed_origins: list[str] | None = None,
):
    """WSGI app: engine + key → callable(environ, start_response).
    ``allowed_origins`` restricts credentialed CORS to an allowlist
    (see `_cors_headers`); default None keeps reference parity."""
    origins = _resolve_allowed_origins(allowed_origins)

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "")
        cors = _cors_headers(environ, origins)
        if environ.get("REQUEST_METHOD") == "OPTIONS":
            # CORS preflight: allowed methods + echo of the requested
            # headers (flask-cors' default preflight shape)
            headers = [("Allow", "GET, HEAD, OPTIONS")] + cors
            if cors:
                headers.append(
                    ("Access-Control-Allow-Methods", "GET, HEAD, OPTIONS")
                )
                req_headers = environ.get(
                    "HTTP_ACCESS_CONTROL_REQUEST_HEADERS"
                )
                if req_headers:
                    headers.append(
                        ("Access-Control-Allow-Headers", req_headers)
                    )
            start_response("200 OK", headers)
            return [b""]
        if environ.get("REQUEST_METHOD") != "GET":
            start_response(
                "405 Method Not Allowed", [("Allow", "GET")] + cors
            )
            return [b""]

        kind = None
        if path == "/metastore/search":
            kind = "dataset"
        elif path.startswith("/metastore/search/"):
            kind = path[len("/metastore/search/") :] or None
        if kind is None:
            start_response(
                "404 Not Found",
                [("Content-Type", "application/json")] + cors,
            )
            return [json.dumps({"error": "not found"}).encode()]

        params = parse_qs(environ.get("QUERY_STRING", ""), keep_blank_values=True)
        callback = params.pop("callback", [None])[0]
        token = environ.get("HTTP_AUTH_TOKEN") or params.get("jwt", [None])[0]
        userid = decode_jwt(token, private_key)

        result = engine.search(kind, userid, params)
        body = json.dumps(result, default=str)
        if callback:
            body = f"{callback}({body});"
            ctype = "application/javascript"
        else:
            ctype = "application/json"
        # error containment (metastore/controllers.py:12-17): failures
        # are 200s with an error key, never 5xx
        start_response("200 OK", [("Content-Type", ctype)] + cors)
        return [body.encode()]

    return app


def serve(engine: SearchEngine, private_key: str, port: int = 5000):
    """Dev server (reference server.py:6-16 equivalent)."""
    from wsgiref.simple_server import make_server

    httpd = make_server("", port, create_app(engine, private_key))
    httpd.serve_forever()
