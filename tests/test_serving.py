"""Keep-alive serving process (Roxie analog): HTTP lookups against a
memory-resident index must equal driver-side traversals, across
concurrent clients, without rebuilding the index per request."""

import json
import threading
import urllib.request

from prefixtree_spark import build_local_index, create
from prefixtree_spark.serving import PrefixTreeServer
from tests.conftest import brute_levenshtein
from tests.test_build import SPARSE_WORDS, _words_df


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def test_http_serving_matches_local_index(spark):
    pt = create(_words_df(spark, SPARSE_WORDS), "word", num_partitions=3)
    idx = build_local_index(pt)
    with PrefixTreeServer(idx) as srv:
        assert _get(srv.url("/health"))["nodes"] == len(idx.ids)
        got = [tuple(x) for x in _get(srv.url("/search?q=KAMINSKI&k=1"))]
        assert got == sorted(
            (w, brute_levenshtein("KAMINSKI", w))
            for w in SPARSE_WORDS
            if brute_levenshtein("KAMINSKI", w) <= 1
        )
        assert _get(srv.url("/prefix?p=SM")) == idx.search_prefix("SM")

        # concurrent clients share ONE immutable index (no locks, no
        # rebuilds): hammer it from threads and compare every answer
        queries = ["KAMINSKI", "SMITH", "BAYLISS", "CHARLES", "ZZZZ"]
        results: dict[str, list] = {}

        def client(q):
            results[q] = [tuple(x) for x in _get(srv.url(f"/search?q={q}&k=2"))]

        threads = [threading.Thread(target=client, args=(q,)) for q in queries]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for q in queries:
            assert results[q] == idx.search(q, 2)

    # stopped: the port no longer accepts connections
    import pytest

    with pytest.raises(Exception):
        _get(srv.url("/health"))


def test_http_serving_bad_requests(spark):
    pt = create(_words_df(spark, SPARSE_WORDS), "word")
    with PrefixTreeServer(build_local_index(pt)) as srv:
        import urllib.error

        for path in ("/search", "/search?q=x&k=notanint", "/nope"):
            try:
                _get(srv.url(path))
                raise AssertionError(f"{path} should have failed")
            except urllib.error.HTTPError as e:
                assert e.code in (400, 404)


def test_search_k_clamped_and_double_start_raises(spark):
    """Unbounded k would traverse the whole trie into one response; a
    second start() would leak a live server with no stop handle."""
    import urllib.error

    import pytest as _pt

    pt = create(_words_df(spark, SPARSE_WORDS), "word")
    with PrefixTreeServer(build_local_index(pt)) as srv:
        with _pt.raises(RuntimeError, match="already running"):
            srv.start()
        for bad in ("-1", "9999"):
            try:
                _get(srv.url(f"/search?q=CAT&k={bad}"))
                raise AssertionError(f"k={bad} should have been rejected")
            except urllib.error.HTTPError as e:
                assert e.code == 400, bad
        assert isinstance(_get(srv.url("/search?q=CAT&k=1")), list)
