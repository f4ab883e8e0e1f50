"""Port of /root/reference/test/cljc/hickory/test/convert.cljc (3 deftests)."""

from hickoryspark import as_hiccup, as_hickory, parse, parse_fragment
from hickoryspark.html.convert import (
    hiccup_fragment_to_hickory,
    hiccup_to_hickory,
    hickory_to_hiccup,
)


def test_hiccup_to_hickory():
    # convert.cljc:8-16
    for src in (
        "<i>Hi.</i>",
        '<i>Outer<b class="foo">Inner.</b></i>',
        "<a href='http://localhost/?a=1&amp;b=2'>Hi</a>",
        "<script>alert();</script>",
    ):
        assert as_hickory(parse(src)) == hiccup_to_hickory(as_hiccup(parse(src)))


def test_hiccup_fragment_to_hickory():
    # convert.cljc:18-23
    for src in (
        '<img src="a.jpg">',
        "<a href=\"/a.txt\"><img src=\"a.jpg\"></a><b>It's an a.</b>",
    ):
        assert [as_hickory(f) for f in parse_fragment(src)] == (
            hiccup_fragment_to_hickory([as_hiccup(f) for f in parse_fragment(src)])
        )


def test_hickory_to_hiccup():
    # convert.cljc:26-40
    for src in (
        "<i>Hi.</i>",
        '<i>Outer<b class="foo">Inner.</b></i>',
        "<a href='http://localhost/?a=1&amp;b=2'>Hi</a>",
        "<script>alert();</script>",
    ):
        assert as_hiccup(parse(src)) == hickory_to_hiccup(as_hickory(parse(src)))
    for src in (
        '<img src="a.jpg">',
        "<a href=\"/a.txt\"><img src=\"a.jpg\"></a><b>It's an a.</b>",
    ):
        assert [as_hiccup(f) for f in parse_fragment(src)] == [
            hickory_to_hiccup(as_hickory(f)) for f in parse_fragment(src)
        ]
