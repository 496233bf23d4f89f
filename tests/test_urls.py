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
