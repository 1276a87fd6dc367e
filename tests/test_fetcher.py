"""Live fetch stage, offline: file:// URLs exercise the exact code path
(opener, timeout plumbing, size ceiling, error classes) without network."""

import pytest
from pyspark.sql import functions as F

import borges_spark.sources.fetcher as FE
from borges_spark.sources.fetcher import fetch_urls


@pytest.fixture()
def web_dir(tmp_path):
    d = tmp_path / "www"
    d.mkdir()
    (d / "a.html").write_text("<html><body><p>alpha</p></body></html>")
    (d / "b.html").write_text("<html><body><p>beta</p></body></html>")
    (d / "big.html").write_text("x" * 2048)
    return d


def test_fetch_file_urls(spark, web_dir):
    urls = [
        (f"file://{web_dir}/a.html",),
        (f"file://{web_dir}/b.html",),
        (f"file://{web_dir}/missing.html",),  # URLError -> 503 transient
        ("http://[malformed",),  # ValueError -> 400 permanent
    ]
    df = spark.createDataFrame(urls, "url string")
    out = {r["url"]: r for r in fetch_urls(df).collect()}
    a = out[f"file://{web_dir}/a.html"]
    assert a["status"] == 200
    assert b"alpha" in bytes(a["html"])
    assert out[f"file://{web_dir}/missing.html"]["status"] == 503
    assert out[f"file://{web_dir}/missing.html"]["html"] is None
    assert out["http://[malformed"]["status"] == 400


def test_fetch_size_ceiling(spark, web_dir, monkeypatch):
    monkeypatch.setattr(FE, "make_http_fetcher", FE.make_http_fetcher)  # no-op; clarity
    df = spark.createDataFrame([(f"file://{web_dir}/big.html",)], "url string")
    # shrink the ceiling via a custom fetcher
    fetched = df.mapInPandas(
        FE.make_http_fetcher(max_bytes=1024), "url string, status int, html binary"
    )
    row = fetched.collect()[0]
    assert row["status"] == 413  # DocumentTooLarge routing (paper_xml.py:109-120)
    assert row["html"] is None


def test_fetch_carries_extra_columns(spark, web_dir):
    df = spark.createDataFrame(
        [(f"file://{web_dir}/a.html", "h1", 7)], "url string, host string, depth int"
    )
    out = fetch_urls(df).collect()[0]
    assert out["host"] == "h1" and out["depth"] == 7 and out["status"] == 200


def test_fetch_statuses_route_like_engine(spark, web_dir):
    """End-to-end with the engine's outcome router."""
    from borges_spark.operators.frontier import route_fetch_outcomes

    rows = [
        (f"file://{web_dir}/a.html", 1, "h", 0, 1.0, 0, 0, "pending", 0, 0),
        (f"file://{web_dir}/missing.html", 2, "h", 0, 1.0, 1, 0, "pending", 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, depth int, priority double, "
        "discovered_seq long, discovered_round int, state string, attempts int, next_allowed_round int",
    )
    fetched = fetch_urls(df)
    routed = {r["url"]: r for r in route_fetch_outcomes(fetched.drop("html"), 0).collect()}
    assert routed[f"file://{web_dir}/a.html"]["state"] == "fetched"
    # 503 transient with attempts remaining -> back to pending w/ cooldown
    miss = routed[f"file://{web_dir}/missing.html"]
    assert miss["state"] == "pending" and miss["next_allowed_round"] == 2


def test_login_session_fetch(spark):
    """S6 — form POST login -> session cookie -> authenticated fetch
    (aip_spider.py:43-64): a local stub server requires the cookie minted
    by /doLogin, whose form must echo the hidden `id` from /showLogin."""
    import http.server
    import threading
    import urllib.parse

    from borges_spark.sources.fetcher import LoginConfig

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/showLogin":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(
                    b'<form><input type="hidden" name="id" value="tok-123"/></form>'
                )
            elif self.path.startswith("/paper/"):
                if "session=granted" in (self.headers.get("Cookie") or ""):
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(
                        f"<html><body><p>paper {self.path.rsplit('/', 1)[1]}</p></body></html>".encode()
                    )
                else:
                    self.send_response(403)
                    self.end_headers()
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()
            fields = dict(urllib.parse.parse_qsl(body))
            if (
                self.path == "/doLogin"
                and fields.get("id") == "tok-123"
                and fields.get("password") == "pw"
                and self.headers.get("Content-Type") == "application/x-www-form-urlencoded"
            ):
                self.send_response(200)
                self.send_header("Set-Cookie", "session=granted; Path=/")
                self.end_headers()
            else:
                self.send_response(401)
                self.end_headers()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        df = spark.createDataFrame([(f"{base}/paper/{i}",) for i in range(4)], "url string")
        # without login: 403 everywhere
        denied = fetch_urls(df).collect()
        assert all(r["status"] == 403 for r in denied)
        # with login: hidden id harvested, cookie carried, 200 everywhere
        login = LoginConfig(
            submit_url=f"{base}/doLogin",
            form=(("login", "user"), ("password", "pw"), ("loginSubmit", "Login")),
            login_page_url=f"{base}/showLogin",
            hidden_fields=("id",),
        )
        granted = fetch_urls(df, login=login).collect()
        assert all(r["status"] == 200 for r in granted)
        assert b"paper 0" in bytes(min(granted, key=lambda r: r["url"])["html"])
    finally:
        srv.shutdown()


def test_render_proxy_routing(spark):
    """S8 — JS-heavy hosts fetch THROUGH the Splash render endpoint with
    the reference's wait/timeout args (RSC/metadata.py:39); other hosts
    fetch direct. The stub below plays the Splash daemon."""
    import http.server
    import threading
    import urllib.parse

    from borges_spark.sources.fetcher import RenderConfig

    seen = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            parsed = urllib.parse.urlsplit(self.path)
            if parsed.path == "/render.html":
                q = dict(urllib.parse.parse_qsl(parsed.query))
                seen.append(q)
                self.send_response(200)
                self.end_headers()
                self.wfile.write(
                    f"<html><body>RENDERED {q['url']} wait={q['wait']}</body></html>".encode()
                )
            elif parsed.path.startswith("/direct"):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"<html><body>plain</body></html>")
            else:
                self.send_response(404)
                self.end_headers()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        render = RenderConfig(
            endpoint=f"{base}/render.html",
            hosts=("pubs.rsc.example",),  # unresolvable on purpose: must go via splash
            wait_s=10.0,
            timeout_s=90.0,
        )
        df = spark.createDataFrame(
            [("https://pubs.rsc.example/en/content/article",), (f"{base}/direct/1",)],
            "url string",
        )
        out = {r["url"]: r for r in fetch_urls(df, render=render).collect()}
        rendered = out["https://pubs.rsc.example/en/content/article"]
        assert rendered["status"] == 200
        assert b"RENDERED https://pubs.rsc.example" in bytes(rendered["html"])
        assert b"wait=10" in bytes(rendered["html"])
        assert bytes(out[f"{base}/direct/1"]["html"]) == b"<html><body>plain</body></html>"
        assert seen and seen[0]["timeout"] == "90"
    finally:
        srv.shutdown()
