#!/usr/bin/env python
"""High-budget differential fuzz of the HTML fast paths — the companion of
scripts/fuzz_urls.py for functions/html.py (every URL fast-path bug ever
found came from this harness class, so the HTML guards get the same
raised-budget treatment).

Properties (each compares a fast path against the GOLDEN form it must be
byte-identical to):

  P1  clean_and_extract(html) == golden two-parse contract:
        cleaned = serialize(drop_script(parse(html)))   (verbatim on error)
        text    = extract_text(cleaned)
      This exercises BOTH the zero-parse token-scan fast path and the
      single-parse DOM-walk (with its _ReparseSensitive fallback).
  P2  extract_links(html) == the golden streaming-parse collector
      (exercises _extract_links_fast's guards).

The generator mixes markup soup (random tags/attrs/entities/comments/
rawtext/declarations, nesting errors, unterminated tags) with structured
near-simple documents that sit right at the guard boundaries — the
dangerous region is "almost simple".

Usage:
    python scripts/fuzz_html.py [--examples 20000] [--seed 0]
Exit 1 on any divergence (printed in repr form, ready to pin as a test).
"""
from __future__ import annotations

import argparse
import sys

from hypothesis import HealthCheck, given, seed as hyp_seed, settings
from hypothesis import strategies as st

sys.path.insert(0, ".")

from crawler_german_localpoliticans_spark.functions import html as H  # noqa: E402

FAILURES: list[tuple] = []


def _record(tag, *parts):
    FAILURES.append((tag, parts))
    print(f"FAIL {tag}: " + " ".join(repr(p) for p in parts))


def golden_clean_and_extract(html: str) -> tuple[str, str]:
    """The two-parse contract form, no fast paths: DOM -> drop script ->
    serialize; text = extract_text over the serialized clean bytes."""
    try:
        root = H._parse(html)
        H._drop_tag(root, "script")
        out: list[str] = []
        H._serialize(root, out)
        cleaned = "".join(out)
    except Exception:
        return html, H.extract_text(html)
    return cleaned, H.extract_text(cleaned)


def golden_links(html: str) -> list[str]:
    collector = H._LinkCollector()
    try:
        collector.feed(html)
        collector.close()
    except Exception:
        pass
    return collector.links


TAGS = ["p", "div", "a", "b", "span", "script", "style", "br", "img", "P", "A"]
soup_bits = st.one_of(
    st.text(alphabet="ab <>&;\"'=/-ä\n\t", max_size=12),
    st.sampled_from(
        [
            "<p>", "</p>", "<div>", "</div>", "<a href=\"x\">", "</a>",
            "<a href='y'>", "<a href=x>", "<A HREF=\"Z\">", "<br>", "<br/>",
            "<script>", "</script>", "<style>", "</style>", "<script>var a=1;</script>",
            "<style>.c{}</style>", "<!-- c -->", "<!doctype html>", "<?pi?>",
            "&amp;", "&auml;", "&#65;", "&bogus;", "&", "<![CDATA[x]]>",
            "<p attr=\"v\">", "<p a-b=\"v\">", "<p  a=\"v\">", "<p a=\"v\" >",
            "<a href=\"u\" id=\"i\">", "</b>", "<b>", "<em>", "</em>",
            "<a href=\"\">", "<a>", "</a >", "< p>", "<p/>", "<wort",
        ]
    ),
)
soup_st = st.lists(soup_bits, max_size=24).map("".join)

# near-simple: strictly grammar-conforming docs with occasional poison
simple_tag = st.sampled_from(["p", "div", "a", "b", "span"])
def _wrap(tag, inner, attr):
    a = f' href="{attr}"' if tag == "a" else ""
    return f"<{tag}{a}>{inner}</{tag}>"
near_simple_st = st.recursive(
    st.text(alphabet="ab c.", max_size=10),
    lambda inner: st.builds(
        _wrap, simple_tag, inner, st.text(alphabet="abz/:.-", max_size=8)
    ),
    max_leaves=6,
).flatmap(
    lambda doc: st.sampled_from(
        [doc, doc + "&", "<script>x</script>" + doc, doc.replace("a", "A", 1),
         doc + "<p>", doc + "</b>", "<style>s{}</style>" + doc]
    )
)

doc_st = st.one_of(soup_st, near_simple_st)


def run(examples: int, seed_val: int) -> int:
    common = settings(
        max_examples=examples,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.filter_too_much,
                               HealthCheck.data_too_large],
        print_blob=False,
    )

    @common
    @hyp_seed(seed_val)
    @given(html=doc_st)
    def p1_clean_extract(html):
        try:
            got = H.clean_and_extract(html)
        except Exception as e:
            _record("P1 clean_and_extract raised", html, type(e).__name__)
            return
        exp = golden_clean_and_extract(html)
        if got != exp:
            _record("P1 clean_and_extract != golden", html, got, exp)

    @common
    @hyp_seed(seed_val + 1)
    @given(html=doc_st)
    def p2_links(html):
        try:
            got = H.extract_links(html)
        except Exception as e:
            _record("P2 extract_links raised", html, type(e).__name__)
            return
        exp = golden_links(html)
        if got != exp:
            _record("P2 extract_links != golden", html, got, exp)

    for name, prop in [("P1 clean_and_extract", p1_clean_extract),
                       ("P2 extract_links", p2_links)]:
        print(f"running {name} @ {examples} examples ...", flush=True)
        prop()

    if FAILURES:
        print(f"\n{len(FAILURES)} divergence(s) found — promote to table-driven cases")
        return 1
    print(f"\nOK: 2 properties x {examples} examples, zero divergences")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    sys.exit(run(a.examples, a.seed))
