"""Port of /root/reference/test/cljc/hickory/test/zip.cljc (2 deftests)."""

from hickoryspark import as_hiccup, as_hickory, parse
from hickoryspark.html.zipper import hickory_zip, hiccup_zip

A_DOC = {
    "type": "document",
    "content": [
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
                        {"type": "element", "attrs": None, "tag": "a", "content": None}
                    ],
                },
            ],
        }
    ],
}


def test_hickory_zipper():
    # zip.cljc:7-67
    z = hickory_zip(as_hickory(parse("<a>")))
    assert z.node == A_DOC
    assert z.next().node == A_DOC["content"][0]
    assert z.next().next().node == {
        "type": "element",
        "attrs": None,
        "tag": "head",
        "content": None,
    }
    assert z.next().next().next().node == A_DOC["content"][0]["content"][1]
    assert z.next().next().next().up().node == A_DOC["content"][0]


def test_hiccup_zipper():
    # zip.cljc:69-83
    forms = as_hiccup(parse("<a>"))
    assert forms == [["html", {}, ["head", {}], ["body", {}, ["a", {}]]]]
    z = hiccup_zip(forms)
    assert z.node == forms
    assert z.next().node == ["html", {}, ["head", {}], ["body", {}, ["a", {}]]]
    assert z.next().next().node == ["head", {}]
    assert z.next().next().next().node == ["body", {}, ["a", {}]]
    assert z.next().next().next().up().node == [
        "html",
        {},
        ["head", {}],
        ["body", {}, ["a", {}]],
    ]
