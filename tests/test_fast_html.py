"""Tree-identity gate for the fast HTML tokenizer (VERDICT r3 #6).

The fast scanner must produce byte-identical DOM trees to the stdlib
html.parser path over the synthetic corpus and a pile of adversarial
constructs; the extract pipeline's byte-identity then follows.
"""
import pytest

from yomitoku_ray.dom import DomNode, parse_html, parse_html_stdlib
from yomitoku_ray.synth.pages import generate_pages_table


def _serialize(node: DomNode) -> str:
    if node.tag == "#text":
        return "T" + repr(node.text)
    attrs = ",".join(f"{k}={v!r}" for k, v in sorted(node.attrs.items()))
    inner = "".join(_serialize(c) for c in node.children)
    return f"<{node.tag}|{attrs}>{inner}</{node.tag}>"


def _assert_same(text: str):
    assert _serialize(parse_html(text)) == _serialize(parse_html_stdlib(text)), repr(
        text[:200]
    )


def test_synthetic_corpus_tree_identity():
    table = generate_pages_table(300)
    n_checked = 0
    for raw in table.column("html").to_pylist():
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue  # malformed-by-construction rows
        _assert_same(text)
        n_checked += 1
    assert n_checked > 250


ADVERSARIAL = [
    "",
    "plain text no markup",
    "a < b and a > b & c &amp; d &#65; &unknown;",
    "<",
    "x<",
    "<p>a<p>b<p>c",
    "<ul><li>1<li>2</ul>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    "<div class='x' id=\"y\" data-a=1 checked>z</div>",
    "<a href='u?a=1&amp;b=2'>link</a>",
    "<img src=x.png/><br/><hr>",
    "<script>if (a < b && c > d) { x = '<p>'; }</script>after",
    "<script>no close tag at all",
    "<script>x</script ><p>y",
    "<script>x</scriptty></script><p>y",
    "<style>p { color: red; } /* </ almost */</style>done",
    "<!-- comment --><p>a</p>",
    "<!-- unterminated comment <p>a</p>",
    "<!-- tricky --  ><p>a</p>",
    "<!DOCTYPE html><html><body>x</body></html>",
    "<![CDATA[ raw <p> stuff ]]><p>after</p>",
    "<![IGNORE[ stuff ]]><p>after</p>",
    "<?php echo '<p>'; ?><p>after</p>",
    "<?><p>a",
    "<!><p>a",
    "</><p>a",
    "</ bogus><p>a",
    "</p extra junk><p>a",
    "<p></p></p></div>",
    "<p attr=>x</p>",
    "<p attr='unclosed>x",
    "<p/ >x",
    "<p / x>y",
    "<p<q>r",
    "<p =junk>x",
    "<div><p>a</div>b",
    "<b><i>nest</b>close</i>",
    "<a b=c d>e</a>",
    "<A HREF='X'>case</A>",
    "tail text <p>mid</p> trailing",
    "<p>&#x3042;&#12354;</p>",
    "<td rowspan=2 colspan='3'>cell</td>",
    "<p>ends with amp &",
    "<p>ends with entity &am",
    "<p>a</p",
    "<p>a<",
    "<p>a<!",
    "<p>a<!-",
    "<p>a<!--",
    "<p>a<![",
    "<p>a<![CD",
    "\x00<p>nul\x00byte</p>",
    "<p\x00odd>x</p\x00odd>",
]


@pytest.mark.parametrize("idx", range(len(ADVERSARIAL)))
def test_adversarial_tree_identity(idx):
    _assert_same(ADVERSARIAL[idx])


def test_fuzz_tree_identity():
    import random

    rng = random.Random(42)
    alphabet = "<>/!?-=&;'\" abpscript汉字\tTx[]#"
    for _ in range(800):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        _assert_same(s)


# -- property-based equivalence ---------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_html_fragments = st.lists(
    st.one_of(
        st.text(
            alphabet="<>/!?-=&;'\" \t\nabpqrs01汉字[]#.:,%\\x",
            min_size=0,
            max_size=25,
        ),
        st.sampled_from(
            [
                "<p>", "</p>", "<div class='x'>", "<br/>", "<table><tr><td>",
                "<script>", "</script>", "<style>", "</style>", "<!-- c -->",
                "<!doctype html>", "<![CDATA[x]]>", "<?pi?>", "&amp;", "&#65;",
                "&unknown;", "<a href=\"u?a=1&amp;b\">", "</", "<!", "<![",
            ]
        ),
    ),
    max_size=14,
).map("".join)


@settings(max_examples=400, deadline=None)
@given(_html_fragments)
def test_property_tree_identity(fragment):
    _assert_same(fragment)
