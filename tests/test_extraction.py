"""Unit tests for the generic main-content extractor and PII redactor
(`text/extraction.py`) on handcrafted HTML — each boilerplate
heuristic exercised in isolation, plus the synthesized-corpus
round-trip the driver oracle checks end-to-end."""

import pyarrow as pa

from cheque_ocr_project_ray.text import extraction as ex


def extract(html_rows):
    t = pa.table({"doc_id": pa.array(range(len(html_rows)), pa.int64()),
                  "html": html_rows})
    return ex.extract_main_content(t).to_pydict()


def test_script_and_style_stripped():
    out = extract(["<p>keep these five words here"
                   "<script>var x = 'dropped words ignored';</script>"
                   "<style>p{color:red}</style></p>"])
    assert out["main_text"] == ["keep these five words here"]
    assert out["n_blocks"] == [1]


def test_short_block_dropped_by_word_mass():
    out = extract(["<p>only four words here</p>"
                   "<p>this paragraph has plenty of words to keep</p>"])
    assert out["n_blocks"] == [2]
    assert out["n_kept"] == [1]
    assert out["main_text"] == [
        "this paragraph has plenty of words to keep"]


def test_boilerplate_tag_dropped_even_with_mass():
    out = extract(["<nav>six words of nav text here</nav>"
                   "<footer>six words of footer text here</footer>"
                   "<p>the one real content paragraph here</p>"])
    assert out["n_blocks"] == [3]
    assert out["n_kept"] == [1]
    assert out["main_text"] == ["the one real content paragraph here"]


def test_boilerplate_class_dropped():
    out = extract(['<div class="sidebar">six words in the sidebar '
                   "div</div>"
                   '<div class="story">six words in the story '
                   "div</div>"])
    assert out["n_kept"] == [1]
    assert out["main_text"] == ["six words in the story div"]


def test_link_density_drops_linkfarm():
    linky = ('<div><a href="/a">one link</a> <a href="/b">two link</a>'
             " tail</div>")
    plain = "<div>a paragraph with a single <a href=\"/x\">link</a> " \
            "inside lots of ordinary prose text</div>"
    out = extract([linky + plain])
    assert out["n_blocks"] == [2]
    assert out["n_kept"] == [1]
    assert out["main_text"][0].startswith("a paragraph with a single "
                                          "link inside")


def test_entities_decoded_and_whitespace_collapsed():
    out = extract(["<p>fish &amp; chips   cost \n five &quot;euro&quot;"
                   "</p>"])
    assert out["main_text"] == ['fish & chips cost five "euro"']


def test_inline_tags_stripped_from_kept_text():
    out = extract(["<p>some <b>bold</b> and <i>italic</i> words "
                   "kept</p>"])
    assert out["main_text"] == ["some bold and italic words kept"]
    assert out["words_kept"] == [6]


def test_fragment_without_block_tag_ignored():
    out = extract(["junk prefix <p>five good words kept here</p> "
                   "trailing junk with no tag"])
    assert out["n_blocks"] == [1]
    assert out["main_text"] == ["five good words kept here"]


def test_empty_batch_keeps_schema():
    out = ex.extract_main_content(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "html": pa.array([], pa.string())}))
    assert out.column_names == ["doc_id", "n_blocks", "n_kept",
                                "words_kept", "main_text"]
    assert out.num_rows == 0


def test_synthesis_roundtrip_recovers_text():
    """For a doc whose halves both clear MIN_WORDS, the extractor
    recovers exactly the source tokens from the rendered HTML."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t = pa.table({"doc_id": pa.array([7], pa.int64()), "text": [text]})
    out = ex.extract_main_content(ex.synthesize_html(t)).to_pydict()
    assert out["main_text"] == [
        "alpha beta gamma delta epsilon\nzeta eta theta iota kappa"]
    assert out["n_blocks"] == [ex.RENDERED_BLOCKS]
    assert out["words_kept"] == [10]


def test_redactor_counts_and_scrubs():
    t = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": ["mail a@b.io and c.d@e.org, see https://x.y/z?q=1 "
                 "then call +91-555-1234 please"]})
    out = ex.redact_pii(t).to_pydict()
    assert out["n_emails"] == [2]
    assert out["n_urls"] == [1]
    assert out["n_phones"] == [1]
    assert out["clean_text"] == [
        "mail <EMAIL> and <EMAIL>, see <URL> then call <PHONE> please"]


def test_redactor_urls_before_emails():
    # an address inside a URL is scrubbed as part of the URL, not
    # counted or replaced separately
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": ["go https://h.io/u?mail=a@b.io now"]})
    out = ex.redact_pii(t).to_pydict()
    assert out["clean_text"] == ["go <URL> now"]
    assert out["n_urls"] == [1]
