"""HTTP layer tests: routing, JWT identity, JSONP, error containment —
driven through a real socket (wsgiref server thread).
"""

import json
import threading
import urllib.request
from wsgiref.simple_server import make_server

import pytest

from metastore_spark.api import dataset_events_engine
from metastore_spark.rest import create_app, decode_jwt, encode_jwt
from tests import fixtures as fx

KEY = "test-private-key"


@pytest.fixture(scope="module")
def server(spark):
    engine = dataset_events_engine(
        spark, fx.private_records(spark), fx.some_event_records(spark, 10)
    )
    httpd = make_server("127.0.0.1", 0, create_app(engine, KEY))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req) as r:
        return r.status, r.headers, r.read().decode()


def test_search_anonymous(server):
    status, _, body = get(f"{server}/metastore/search")
    assert status == 200
    out = json.loads(body)
    assert out["summary"]["total"] == 4  # published only


def test_search_with_jwt_header(server):
    tok = encode_jwt({"userid": "owner1"}, KEY)
    status, _, body = get(
        f"{server}/metastore/search", headers={"Auth-Token": tok}
    )
    assert json.loads(body)["summary"]["total"] == 6


def test_search_with_jwt_param(server):
    tok = encode_jwt({"userid": "owner1"}, KEY)
    _, _, body = get(f"{server}/metastore/search?jwt={tok}")
    assert json.loads(body)["summary"]["total"] == 6


def test_invalid_jwt_is_anonymous(server):
    _, _, body = get(
        f"{server}/metastore/search", headers={"Auth-Token": "garbage.token.sig"}
    )
    assert json.loads(body)["summary"]["total"] == 4


def test_events_kind_route(server):
    _, _, body = get(f"{server}/metastore/search/events")
    assert json.loads(body)["summary"]["total"] == 5


def test_filters_via_query_string(server):
    _, _, body = get(f"{server}/metastore/search?name=%22owner1-published-cat%22")
    out = json.loads(body)
    assert out["summary"]["total"] == 1


def test_error_is_contained_200(server):
    status, _, body = get(f"{server}/metastore/search?badfield=notjson")
    assert status == 200
    out = json.loads(body)
    assert "error" in out
    assert out["summary"]["total"] == 0


def test_jsonp(server):
    _, headers, body = get(f"{server}/metastore/search?callback=cb")
    assert headers["Content-Type"] == "application/javascript"
    assert body.startswith("cb(") and body.endswith(");")


def test_unknown_kind_contained(server):
    status, _, body = get(f"{server}/metastore/search/nope")
    assert status == 200
    assert "error" in json.loads(body)


def test_jwt_wrong_key_is_anonymous():
    tok = encode_jwt({"userid": "u"}, "other-key")
    assert decode_jwt(tok, KEY) is None
    assert decode_jwt(None, KEY) is None
    assert decode_jwt(encode_jwt({"userid": "u"}, KEY), KEY) == "u"


def test_cors_headers_echo_origin_with_credentials(server):
    """Reference parity (metastore/__init__.py:13-14, flask-cors with
    supports_credentials=True): a cross-origin GET gets its Origin
    ECHOED (never '*' — credentialed responses forbid it) plus
    Allow-Credentials and Vary: Origin, on both endpoints."""
    for path in ("/metastore/search", "/metastore/search/events"):
        status, headers, _ = get(
            f"{server}{path}", headers={"Origin": "http://datahub.io"}
        )
        assert status == 200
        assert (
            headers["Access-Control-Allow-Origin"] == "http://datahub.io"
        )
        assert headers["Access-Control-Allow-Credentials"] == "true"
        assert headers["Vary"] == "Origin"


def test_cors_preflight_options(server):
    req = urllib.request.Request(
        f"{server}/metastore/search",
        method="OPTIONS",
        headers={
            "Origin": "http://datahub.io",
            "Access-Control-Request-Method": "GET",
            "Access-Control-Request-Headers": "Auth-Token",
        },
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        h = r.headers
    assert h["Access-Control-Allow-Origin"] == "http://datahub.io"
    assert h["Access-Control-Allow-Credentials"] == "true"
    assert "GET" in h["Access-Control-Allow-Methods"]
    assert h["Access-Control-Allow-Headers"] == "Auth-Token"


def test_no_origin_no_cors_headers(server):
    _, headers, _ = get(f"{server}/metastore/search")
    assert "Access-Control-Allow-Origin" not in headers
    assert "Access-Control-Allow-Credentials" not in headers


def test_cors_allowlist_restricts_credentialed_echo(spark):
    """ADVICE r8 (low): echo-any-origin + credentials is reference
    parity but lets arbitrary sites read JWT-bearing responses;
    `allowed_origins` restricts the echo. Listed origin → full
    credentialed CORS; unlisted → NO CORS headers (browser blocks the
    read); no Origin → unchanged non-CORS response."""
    engine = dataset_events_engine(
        spark, fx.private_records(spark), fx.some_event_records(spark, 10)
    )
    app = create_app(engine, KEY, allowed_origins=["http://datahub.io"])
    httpd = make_server("127.0.0.1", 0, app)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        _, h, _ = get(
            f"{base}/metastore/search",
            headers={"Origin": "http://datahub.io"},
        )
        assert h["Access-Control-Allow-Origin"] == "http://datahub.io"
        assert h["Access-Control-Allow-Credentials"] == "true"
        _, h, _ = get(
            f"{base}/metastore/search",
            headers={"Origin": "http://evil.example"},
        )
        assert "Access-Control-Allow-Origin" not in h
        assert "Access-Control-Allow-Credentials" not in h
        status, h, _ = get(f"{base}/metastore/search")
        assert status == 200
        assert "Access-Control-Allow-Origin" not in h
    finally:
        httpd.shutdown()


def test_cors_allowlist_env_var(spark, monkeypatch):
    """METASTORE_CORS_ORIGINS env var configures the allowlist when no
    create_app arg is given; unset keeps reference-parity echo-any."""
    from metastore_spark.rest import _resolve_allowed_origins

    monkeypatch.setenv("METASTORE_CORS_ORIGINS", "http://a.io, http://b.io")
    assert _resolve_allowed_origins(None) == {"http://a.io", "http://b.io"}
    # explicit arg wins over env
    assert _resolve_allowed_origins(["http://c.io"]) == {"http://c.io"}
    monkeypatch.delenv("METASTORE_CORS_ORIGINS")
    assert _resolve_allowed_origins(None) is None
