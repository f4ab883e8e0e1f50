"""Port of /root/reference/test/cljc/hickory/test/core.cljc (4 deftests).

Golden hickory/hiccup trees; keyword -> string, nil -> None, vector ->
list. The clj-only ``:#doctype`` attr artifact (core.cljc:20) is
intentionally NOT replicated (see SURVEY.md §1.2).
"""

from hickoryspark import as_hiccup, as_hickory, parse, parse_fragment


def test_basic_documents_hiccup():
    # core.cljc:8-15
    assert as_hiccup(
        parse(
            '<!DOCTYPE html><a href="foo">foo</a> <a id="so" href="bar">bar</a>'
            '<script src="blah.js">alert("hi");</script>'
        )
    ) == [
        "<!DOCTYPE html>",
        [
            "html",
            {},
            ["head", {}],
            [
                "body",
                {},
                ["a", {"href": "foo"}, "foo"],
                " ",
                ["a", {"id": "so", "href": "bar"}, "bar"],
                ["script", {"src": "blah.js"}, 'alert("hi");'],
            ],
        ],
    ]


def test_basic_documents_hickory():
    # core.cljc:17-44
    assert as_hickory(
        parse(
            '<!DOCTYPE html><a href="foo">foo</a> <a id="so" href="bar">bar</a>'
            '<script src="blah.js">alert("hi");</script>'
        )
    ) == {
        "type": "document",
        "content": [
            {
                "type": "document-type",
                "attrs": {"name": "html", "publicid": "", "systemid": ""},
            },
            {
                "type": "element",
                "attrs": None,
                "tag": "html",
                "content": [
                    {"type": "element", "attrs": None, "tag": "head", "content": None},
                    {
                        "type": "element",
                        "attrs": None,
                        "tag": "body",
                        "content": [
                            {
                                "type": "element",
                                "attrs": {"href": "foo"},
                                "tag": "a",
                                "content": ["foo"],
                            },
                            " ",
                            {
                                "type": "element",
                                "attrs": {"id": "so", "href": "bar"},
                                "tag": "a",
                                "content": ["bar"],
                            },
                            {
                                "type": "element",
                                "attrs": {"src": "blah.js"},
                                "tag": "script",
                                "content": ['alert("hi");'],
                            },
                        ],
                    },
                ],
            },
        ],
    }


def test_basic_documents2_hiccup():
    # core.cljc:48-57 — comment inside body
    assert as_hiccup(
        parse(
            '<!DOCTYPE html><body><!--comment--><a href="foo">foo</a> '
            '<a id="so" href="bar">bar</a>'
            '<script src="blah.js">alert("hi");</script></body>'
        )
    ) == [
        "<!DOCTYPE html>",
        [
            "html",
            {},
            ["head", {}],
            [
                "body",
                {},
                "<!--comment-->",
                ["a", {"href": "foo"}, "foo"],
                " ",
                ["a", {"id": "so", "href": "bar"}, "bar"],
                ["script", {"src": "blah.js"}, 'alert("hi");'],
            ],
        ],
    ]


def test_basic_documents2_hickory():
    # core.cljc:59-88
    result = as_hickory(
        parse(
            '<!DOCTYPE html><body><!--comment--><a href="foo">foo</a> '
            '<a id="so" href="bar">bar</a>'
            '<script src="blah.js">alert("hi");</script></body>'
        )
    )
    body = result["content"][1]["content"][1]
    assert body["content"][0] == {"type": "comment", "content": ["comment"]}
    assert body["content"][1]["attrs"] == {"href": "foo"}
    assert body["content"][2] == " "
    assert body["content"][3]["attrs"] == {"id": "so", "href": "bar"}
    assert body["content"][4]["content"] == ['alert("hi");']


def test_basic_document_fragment():
    # core.cljc:92-107 — fragment with 3 roots (a, " ", a)
    frags = parse_fragment('<a href="foo">foo</a> <a href="bar">bar</a>')
    assert [as_hiccup(f) for f in frags] == [
        ["a", {"href": "foo"}, "foo"],
        " ",
        ["a", {"href": "bar"}, "bar"],
    ]
    assert [as_hickory(f) for f in frags] == [
        {"type": "element", "attrs": {"href": "foo"}, "tag": "a", "content": ["foo"]},
        " ",
        {"type": "element", "attrs": {"href": "bar"}, "tag": "a", "content": ["bar"]},
    ]


def test_unencoded_text_nodes():
    # core.cljc:109-127 — entity decode in hickory, re-escape in hiccup
    assert as_hiccup(parse("<p>ABC&amp;\n\nDEF.</p>")) == [
        ["html", {}, ["head", {}], ["body", {}, ["p", {}, "ABC&amp;\n\nDEF."]]]
    ]
    assert as_hiccup(parse("<pre>ABC&amp;\n\nDEF.</pre>")) == [
        ["html", {}, ["head", {}], ["body", {}, ["pre", {}, "ABC&amp;\n\nDEF."]]]
    ]
    t = as_hickory(parse("<p>ABC&amp;\n\nDEF.</p>"))
    assert (
        t["content"][0]["content"][1]["content"][0]["content"][0] == "ABC&\n\nDEF."
    )
    t = as_hickory(parse("<pre>ABC&amp;\n\nDEF.</pre>"))
    assert (
        t["content"][0]["content"][1]["content"][0]["content"][0] == "ABC&\n\nDEF."
    )


def test_deeply_nested_tags():
    # core.cljc:129-148 — disabled in the reference (StackOverflow); our
    # iterative parser must pass it (FIXTURES.md B.2 #14).
    tree = as_hickory(parse("<font>abc" * 2048))
    node = tree["content"][0]["content"][1]["content"][0]
    for _ in range(2047):
        node = node["content"][1]
    assert node == {"type": "element", "attrs": None, "tag": "font", "content": ["abc"]}

    hic = as_hiccup(parse("<font>abc" * 2048))
    form = hic[0][3][2]
    for _ in range(2047):
        form = form[3]
    assert form == ["font", {}, "abc"]
