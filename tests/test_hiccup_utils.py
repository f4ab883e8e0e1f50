"""Port of /root/reference/test/cljc/hickory/test/hiccup_utils.cljc (8 deftests)."""

from hickoryspark.html.hiccup_utils import (
    _first_idx,
    class_names,
    expand_content_seqs,
    normalize_element,
    normalize_form,
    tag_id,
    tag_name,
    tag_well_formed,
)


def test_first_idx():
    # hiccup_utils.cljc tests :6-13
    assert _first_idx(-1, -1) == -1
    assert _first_idx(-1, 2) == 2
    assert _first_idx(5, -1) == 5
    assert _first_idx(5, 3) == 3
    assert _first_idx(3, 5) == 3


def test_tag_well_formed():
    # :15-28
    assert tag_well_formed("a") is True
    assert tag_well_formed("a#id") is True
    assert tag_well_formed("a#id.class") is True
    assert tag_well_formed("a.class.class2") is True
    assert tag_well_formed("") is False
    assert tag_well_formed(".class") is False
    assert tag_well_formed("a#") is False
    assert tag_well_formed("a#foo.") is False
    assert tag_well_formed("a.") is False
    assert tag_well_formed("a.foo.") is False
    assert tag_well_formed("#id.class") is False
    assert tag_well_formed("a.class#id") is False
    assert tag_well_formed("a#id#id2") is False


def test_tag_name():
    # :30-37
    assert tag_name("a") == "a"
    assert tag_name("b.class") == "b"
    assert tag_name("b#id") == "b"
    assert tag_name("b.class#id") == "b"
    assert tag_name("b#id.class") == "b"


def test_class_names():
    # :39-44
    assert class_names("a") == []
    assert class_names("a#foo") == []
    assert class_names("a.foo") == ["foo"]
    assert class_names("a#foo.bar") == ["bar"]
    assert class_names("a.foo.bar") == ["foo", "bar"]


def test_id():
    # :46-50
    assert tag_id("a") is None
    assert tag_id("a#foo") == "foo"
    assert tag_id("a#foo.bar") == "foo"


def test_expand_content_seqs():
    # :52-59
    assert expand_content_seqs([1, 2, 3]) == [1, 2, 3]
    assert expand_content_seqs([1, iter([2, [3]])]) == [1, 2, [3]]
    assert expand_content_seqs(
        [1, iter([2, 3]), (x * 2 for x in [1, 2, 3]), [5]]
    ) == [1, 2, 3, 2, 4, 6, [5]]


def test_normalize_element():
    # :61-78
    assert normalize_element(["a", "Hi"]) == ["a", {"id": None, "class": None}, "Hi"]
    assert normalize_element(["A#foo", "Hi"]) == [
        "a",
        {"id": "foo", "class": None},
        "Hi",
    ]
    assert normalize_element(["a.foo", "Hi"]) == [
        "a",
        {"id": None, "class": "foo"},
        "Hi",
    ]
    assert normalize_element(["a#foo.bar", "Hi", "There"]) == [
        "a",
        {"id": "foo", "class": "bar"},
        "Hi",
        "There",
    ]
    assert normalize_element(["a.bar", {"id": "foo"}, "Hi"]) == [
        "a",
        {"id": "foo", "class": "bar"},
        "Hi",
    ]
    assert normalize_element(["A#bip", {"id": "foo", "class": "bar"}]) == [
        "a",
        {"id": "foo", "class": "bar"},
    ]
    assert normalize_element(["a#bip.baz", {"id": "foo", "class": "bar"}]) == [
        "a",
        {"id": "foo", "class": "bar"},
    ]
    assert normalize_element(["a.foo.bar"]) == ["a", {"id": None, "class": "foo bar"}]


def test_normalize_form():
    # :80-94
    assert normalize_form(["A"]) == ["a", {"id": None, "class": None}]
    assert normalize_form(["a", {"href": "localhost"}]) == [
        "a",
        {"id": None, "class": None, "href": "localhost"},
    ]
    assert normalize_form(["a", ["b", "foo"], ["i", "bar"]]) == [
        "a",
        {"id": None, "class": None},
        ["b", {"id": None, "class": None}, "foo"],
        ["i", {"id": None, "class": None}, "bar"],
    ]
    assert normalize_form(["a", iter([["b", "foo"], ["i", "bar"]])]) == [
        "a",
        {"id": None, "class": None},
        ["b", {"id": None, "class": None}, "foo"],
        ["i", {"id": None, "class": None}, "bar"],
    ]
    assert normalize_form(["a", ["b", "foo", ["i", "bar"]]]) == [
        "a",
        {"id": None, "class": None},
        ["b", {"id": None, "class": None}, "foo", ["i", {"id": None, "class": None}, "bar"]],
    ]
