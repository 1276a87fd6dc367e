"""Property-based tests (hypothesis): the pure-Python twins and the
column expressions must agree on arbitrary inputs, and scheduler math
must hold its invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from borges_spark.functions.urls import canonicalize_url_py, url_host_py
from borges_spark.operators.politeness import budget_for

_host_chars = st.text(alphabet=string.ascii_letters + string.digits + "-.", min_size=1, max_size=20)
_path_chars = st.text(alphabet=string.ascii_letters + string.digits + "/._-%", max_size=30)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    host=_host_chars,
    port=st.one_of(st.none(), st.integers(min_value=1, max_value=65535)),
    path=_path_chars,
    query=st.one_of(st.none(), st.text(alphabet=string.ascii_lowercase + "=&", max_size=15)),
    fragment=st.one_of(st.none(), st.text(alphabet=string.ascii_lowercase, max_size=10)),
)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_and_normalized(scheme, host, port, path, query, fragment):
    url = f"{scheme}://{host}"
    if port is not None:
        url += f":{port}"
    url += "/" + path.lstrip("/")
    if query is not None:
        url += f"?{query}"
    if fragment is not None:
        url += f"#{fragment}"

    c = canonicalize_url_py(url)
    # idempotent
    assert canonicalize_url_py(c) == c
    # no fragment survives
    assert "#" not in c
    # scheme + host lowercased
    assert c.split("://")[0] == scheme.lower()
    # default ports stripped, others kept
    h = url_host_py(c)
    assert h == host.lower()
    if port in (80, 443) and ((port == 80) == (scheme.lower() == "http")):
        assert f":{port}" not in c.split("://")[1].split("/")[0]


@given(
    delay=st.floats(min_value=0.001, max_value=10_000, allow_nan=False),
    budget=st.floats(min_value=0.1, max_value=3600, allow_nan=False),
)
@settings(max_examples=500, deadline=None)
def test_budget_invariants(delay, budget):
    k, m = budget_for(delay, budget)
    assert k >= 1 and m >= 1
    if m > 1:
        assert k == 1  # slow hosts: one URL per eligible round
        assert m * budget >= delay * 0.999  # cadence respects the delay
    else:
        # admitted work never exceeds the budget's token count
        assert k * delay <= budget * (1 + 1e-6) + 1e-9


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_similarity_ratio_bounds(s):
    from borges_spark.functions.fidelity import similarity_ratio

    assert similarity_ratio(s, s) == 1.0
    assert 0.0 <= similarity_ratio(s, s[::-1]) <= 1.0


@given(st.text(alphabet=string.printable, max_size=100))
@settings(max_examples=200, deadline=None)
def test_zfill_twin(v):
    from borges_spark.functions.fidelity import clean_journal_title

    out = clean_journal_title(v)
    assert "\n" not in out
    assert "  " not in out
