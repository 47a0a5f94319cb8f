"""Differential fuzz: the fused fast-path tokenizer must produce EXACTLY the
same (pos, token) stream as the full scanner on arbitrary input — the slow
path is the semantic authority (psparse.nexttoken docstring)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdfparse_spark.kernel.psparse import PSBaseParser, PSEOF


def _tokens(parser_method_name: str, data: bytes) -> list:
    p = PSBaseParser(data)
    step = getattr(p, parser_method_name)
    out = []
    for _ in range(5000):
        try:
            out.append(step())
        except PSEOF:
            break
    return out


def _assert_same(data: bytes) -> None:
    fast = _tokens("nexttoken", data)
    slow = _tokens("_nexttoken_slow", data)
    assert fast == slow, (data, fast[:10], slow[:10])


_SOUP = st.text(
    alphabet="0123456789+-. /#()<>[]{}%\\\r\n\t aAbBzZ'\"Tjf*qQ",
    max_size=200,
).map(lambda s: s.encode("latin-1"))


@given(_SOUP)
@settings(max_examples=300, deadline=2000, suppress_health_check=[HealthCheck.too_slow])
def test_fast_tokenizer_matches_slow_on_soup(data):
    _assert_same(data)


@given(st.binary(max_size=120))
@settings(max_examples=150, deadline=2000, suppress_health_check=[HealthCheck.too_slow])
def test_fast_tokenizer_matches_slow_on_binary(data):
    _assert_same(data)


def test_fast_tokenizer_edge_cases():
    for data in [
        b"12.", b"12..", b".5", b"-.5", b"+", b"+-12", b"12.34.56", b"5x",
        b"/Name#41B", b"/", b"//", b"/a#", b"true false trueX",
        b"<< >> < > [ ] { }", b"16#F", b"1.2.3", b"- 5", b"%c\n7",
        b"(str)9", b"<AB>2", b"Tj T* f* '", b"1e5", b"0000000017",
    ]:
        _assert_same(data)
