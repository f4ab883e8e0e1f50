"""Port of /root/reference/test/cljc/hickory/test/render.cljc (5 deftests).

Byte-exact HTML output: tag-soup recovery, void elements, escaping,
script non-escaping, doctype rendering, error messages.
"""

import pytest

from hickoryspark import (
    HickoryRenderError,
    as_hiccup,
    as_hickory,
    hiccup_to_html,
    hickory_to_html,
    parse,
    parse_fragment,
)


def test_hickory_to_html():
    # render.cljc:11-12 — tag-soup recovery
    assert (
        hickory_to_html(
            as_hickory(parse('<!DOCTYPE html><P><!--hi--><a href=foo id="bar">hi'))
        )
        == '<!DOCTYPE html><html><head></head><body><p><!--hi-->'
        '<a href="foo" id="bar">hi</a></p></body></html>'
    )
    # render.cljc:14-15 — void elements have no closing tags
    assert (
        hickory_to_html(
            as_hickory(parse("<html><head></head><body>Hi<br>There</body></html>"))
        )
        == "<html><head></head><body>Hi<br>There</body></html>"
    )
    # render.cljc:17-18 — text re-escaped
    assert (
        hickory_to_html(as_hickory(parse_fragment("<code>&lt;html&gt;</code>")[0]))
        == "<code>&lt;html&gt;</code>"
    )
    # render.cljc:20-22 — script contents NOT escaped
    assert (
        hickory_to_html(
            as_hickory(
                parse_fragment(
                    "<body><script>Test<!--Test&Test-->Test</script></body>"
                )[0]
            )
        )
        == "<script>Test<!--Test&Test-->Test</script>"
    )
    # render.cljc:24-25 — attribute contents escaped
    assert (
        hickory_to_html(
            as_hickory(parse_fragment('<img fake-attr="abc&quot;def">')[0])
        )
        == '<img fake-attr="abc&quot;def">'
    )


def test_hickory_doctypes():
    # render.cljc:27-43
    assert (
        hickory_to_html(
            {
                "type": "document-type",
                "attrs": {"name": "html", "publicid": None, "systemid": None},
            }
        )
        == "<!DOCTYPE html>"
    )
    assert (
        hickory_to_html(
            {
                "type": "document-type",
                "attrs": {
                    "name": "html",
                    "publicid": "-//W3C//DTD HTML 4.01//EN",
                    "systemid": "http://www.w3.org/TR/html4/strict.dtd",
                },
            }
        )
        == '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
        '"http://www.w3.org/TR/html4/strict.dtd">'
    )
    assert (
        hickory_to_html(
            as_hickory(parse("<!DOCTYPE html><html><head></head><body></body></html>"))
        )
        == "<!DOCTYPE html><html><head></head><body></body></html>"
    )
    # render.cljc:42-43 — doctype name lowercased, truncated '</body' dropped
    assert (
        hickory_to_html(
            as_hickory(
                parse(
                    '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN" '
                    '"http://www.w3.org/TR/html4/strict.dtd">'
                    "<html><head></head><body></body</html>"
                )
            )
        )
        == '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
        '"http://www.w3.org/TR/html4/strict.dtd">'
        "<html><head></head><body></body></html>"
    )


def test_error_handling():
    # render.cljc:46-55
    data = {"type": "foo", "tag": "a", "attrs": {"foo": "bar"}}
    with pytest.raises(HickoryRenderError, match=r"^Not a valid node: None"):
        hickory_to_html(None)
    with pytest.raises(HickoryRenderError, match=r"^Not a valid node: \{'type': 'foo'"):
        hickory_to_html(data)
    try:
        hickory_to_html(data)
    except HickoryRenderError as e:
        assert e.dom == data


def test_hiccup_to_html():
    # render.cljc:61-76
    assert (
        hiccup_to_html(
            as_hiccup(parse('<!DOCTYPE html><P><!--hi--><a href=foo id="bar">hi'))
        )
        == '<!DOCTYPE html><html><head></head><body><p><!--hi-->'
        '<a href="foo" id="bar">hi</a></p></body></html>'
    )
    assert (
        hiccup_to_html(
            as_hiccup(parse("<html><head></head><body>Hi<br>There</body></html>"))
        )
        == "<html><head></head><body>Hi<br>There</body></html>"
    )
    assert (
        hiccup_to_html([as_hiccup(parse_fragment("<code>&lt;html&gt;</code>")[0])])
        == "<code>&lt;html&gt;</code>"
    )
    assert (
        hiccup_to_html(
            [
                as_hiccup(
                    parse_fragment(
                        "<body><script>Test<!--Test&Test-->Test</script></body>"
                    )[0]
                )
            ]
        )
        == "<script>Test<!--Test&Test-->Test</script>"
    )
    assert (
        hiccup_to_html([as_hiccup(parse_fragment('<img fake-attr="abc&quot;def">')[0])])
        == '<img fake-attr="abc&quot;def">'
    )


def test_hiccup_doctypes():
    # render.cljc:78-82
    assert (
        hiccup_to_html(
            as_hiccup(parse("<!DOCTYPE html><html><head></head><body></body></html>"))
        )
        == "<!DOCTYPE html><html><head></head><body></body></html>"
    )
    assert (
        hiccup_to_html(
            as_hiccup(
                parse(
                    '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN" '
                    '"http://www.w3.org/TR/html4/strict.dtd">'
                    "<html><head></head><body></body</html>"
                )
            )
        )
        == '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
        '"http://www.w3.org/TR/html4/strict.dtd">'
        "<html><head></head><body></body></html>"
    )
