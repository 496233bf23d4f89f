"""URL canonicalization edge cases (the oracle roundtrip covers the five
synthetic shapes; these pin the contract corners it can't reach)."""

from __future__ import annotations

from etlutil_spark.functions.urls import with_url_features


def _norm(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    rows = with_url_features(df, "url").orderBy("i").collect()
    return [
        (r["url_norm"], r["host"], r["registered_domain"], r["path_depth"], r["n_params"])
        for r in rows
    ]


class TestUrlNormalize:
    def test_userinfo_and_port_stripped(self, spark):
        (out,) = _norm(spark, ["https://user:pw@Www.Site.Example.COM:8443/a/b?x=1"])
        assert out == ("https://site.example.com/a/b?x=1", "site.example.com", "example.com", 2, 1)

    def test_root_path_and_no_query(self, spark):
        out = _norm(spark, ["http://example.com/", "http://example.com"])
        # a bare root slash is not a "trailing" slash to strip beyond one segment
        assert out[0] == ("http://example.com/", "example.com", "example.com", 0, 0)
        assert out[1] == ("http://example.com", "example.com", "example.com", 0, 0)

    def test_all_tracking_params_dropped(self, spark):
        (out,) = _norm(spark, ["https://a.example.com/p?utm_source=x&utm_medium=y&gclid=1&fbclid=2&ref=z"])
        assert out[0] == "https://a.example.com/p"
        assert out[4] == 0

    def test_param_order_preserved(self, spark):
        (out,) = _norm(spark, ["https://a.example.com/p?b=2&utm_source=x&a=1"])
        assert out[0] == "https://a.example.com/p?b=2&a=1"

    def test_fragment_stripped_query_kept(self, spark):
        (out,) = _norm(spark, ["https://a.example.com/p?q=1#section-2"])
        assert out[0] == "https://a.example.com/p?q=1"

    def test_multiple_trailing_slashes(self, spark):
        (out,) = _norm(spark, ["https://a.example.com/x/y///"])
        assert out[0] == "https://a.example.com/x/y" and out[3] == 2

    def test_single_label_host_has_no_registered_domain(self, spark):
        (out,) = _norm(spark, ["http://localhost/x"])
        assert out[1] == "localhost" and out[2] == ""


class TestUrlNormalizeProperties:
    def test_idempotent_and_invariant(self, spark):
        """Canonicalization must be a projection: running it on its own
        output changes nothing (else two passes over a corpus disagree),
        and no tracking param survives any input."""
        import itertools

        hosts = ["Example.COM", "www.site.example.org", "a.b.example.net:8080", "u:p@x.example.com"]
        paths = ["", "/", "/A/b", "/a/b/", "/x//"]
        queries = ["", "?utm_source=1", "?a=1&utm_medium=m&b=2", "?ref=r&gclid=g"]
        frags = ["", "#f"]
        urls = [
            f"https://{h}{p}{q}{f}"
            for h, p, q, f in itertools.product(hosts, paths, queries, frags)
        ]
        df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
        once = with_url_features(df, "url").select("i", "url_norm", "host", "path_depth", "n_params")
        twice = with_url_features(
            once.withColumnRenamed("url_norm", "url"), "url"
        ).select("i", "url_norm", "host", "path_depth", "n_params")
        a = {r["i"]: (r["url_norm"], r["host"], r["path_depth"], r["n_params"]) for r in once.collect()}
        b = {r["i"]: (r["url_norm"], r["host"], r["path_depth"], r["n_params"]) for r in twice.collect()}
        assert a == b
        for norm, host, _, _ in a.values():
            assert "utm_" not in norm and "gclid" not in norm and "ref=" not in norm
            assert host == host.lower() and not host.startswith("www.")
            assert "#" not in norm
