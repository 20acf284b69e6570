"""Web-document main-content extraction and PII redaction — the
tier's named extraction operators (HTML boilerplate strip, DOM
heuristics, scrubbing) as fully vectorized Arrow ``map_batches``
stages.

The extractor is GENERIC: it takes any (simple, non-nested) HTML
string column and emits per-document main text plus block statistics,
using the standard boilerplate-removal heuristics — script/style
elimination, block segmentation, tag class/name rules, minimum text
mass, and link density (the jusText/Readability family of signals,
e.g. Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010).  Every step is an Arrow kernel over the whole
batch (RE2 regexes via ``pyarrow.compute``): no Python loop over rows.

Because the synthetic ``documents`` corpus is plain text, the driver
queries first derive a deterministic HTML (or PII-augmented) rendering
of each row — a pure function of ``(doc_id, text)`` expressed with the
same arithmetic in the DuckDB oracle — and then run the generic
operator over it.  The oracle derives the EXPECTED output directly
from the source text (an independent derivation, not a SQL re-
implementation of the parser), so the driver's equality check covers
the whole parse → strip → filter → reassemble path end-to-end.

Scale shape: both operators are stateless streaming maps — no
shuffle, no materialization, no driver state.  At 10^12 documents
they are embarrassingly parallel; block size is bounded by the HTML
payload, so the default Ray block/batch sizing holds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- main-content extraction rules -----------------------------------
BLOCK_TAGS = ("p", "div", "nav", "aside", "footer", "header",
              "article", "section")
KEEP_TAGS = ("p", "div", "article", "section")
MIN_WORDS = 5            # minimum text mass for a content block
MAX_LINK_DENSITY = 1 / 3  # anchors' share of block chars

_TAG_ALT = "|".join(BLOCK_TAGS)
_BLOCK_SPLIT = rf"(?i)</(?:{_TAG_ALT})>"
_BLOCK_OPEN = (rf"(?is)^.*<(?P<tag>{_TAG_ALT})\b(?P<attrs>[^>]*)>"
               r"(?P<content>.*)$")
_DROP_CLASS = (r'(?i)class\s*=\s*"[^"]*'
               r"(?:nav|ads|sidebar|menu|promo|comment)")
# decode order matters: &amp; last so it cannot mint new entities
_ENTITIES = (("&nbsp;", " "), ("&copy;", "©"),
             ("&mdash;", "—"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def _filtered_tokens(text_col):
    """Non-empty whitespace tokens of each row, flattened: returns
    (flat_tokens, per_row_counts) — matches the SQL convention
    ``list_filter(regexp_split_to_array(trim(text), '\\s+'),
    x -> x <> '')`` used across the text family."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(text_col), pattern=r"\s+").combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy()
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    counts = np.bincount(parent[keep],
                         minlength=len(text_col)).astype(np.int64)
    return flat.filter(pa.array(keep)), counts


def _join_lists(values, offsets: np.ndarray, sep: str):
    """binary_join over a list layout built from raw offsets."""
    la = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                  values)
    return pc.binary_join(la, sep)


# --- deterministic HTML rendering of the documents corpus ------------
# One nav (links only), one ad div (class + short), the text split
# into two <p> halves, a sidebar aside (enough words — dropped ONLY
# by the tag/class rule), and an entity-bearing footer with a link.
_HEAD1 = "<html><head><title>Doc "
_HEAD2 = ("</title><style>p{margin:0}</style><script>var t=1;"
          "</script></head><body>"
          '<nav class="nav"><a href="/">Home</a> <a href="/docs">Docs'
          '</a> <a href="/contact">Contact</a></nav>'
          '<div class="ads">buy now limited offer</div><p>')
_MID = ('</p><aside class="sidebar">related links and sponsored '
        "promos about topics</aside><p>")
_TAIL = ("</p><footer>&copy; 2026 Example Corp &mdash; "
         '<a href="/privacy">Privacy</a></footer></body></html>')
# block count of the rendering above (nav, ads, p, aside, p, footer)
RENDERED_BLOCKS = 6


def synthesize_html(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, html): the deterministic rendering.

    The text's non-empty tokens are split into a ceil(n/2) prefix and
    the remaining suffix — the two <p> halves.  The halves are built
    with ONE interleaved-offsets list array over the flat token
    buffer ([s0,m0,s1,m1,...,e_last]: even slices are first halves,
    odd slices second halves, since each row's end is the next row's
    start), so the whole rendering is Arrow kernels end-to-end."""
    n_rows = batch.num_rows
    flat, counts = _filtered_tokens(batch.column("text"))
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    starts = offsets[:-1]
    mids = starts + (counts + 1) // 2
    inter = np.empty(2 * n_rows + 1, np.int64)
    inter[0:-1:2] = starts
    inter[1:-1:2] = mids
    inter[-1] = offsets[-1]
    halves = _join_lists(flat, inter, " ")
    even = pa.array(np.arange(n_rows, dtype=np.int64) * 2)
    p1 = halves.take(even)
    p2 = halves.take(pc.add(even, 1))
    did = pc.cast(batch.column("doc_id"), pa.string())
    html = pc.binary_join_element_wise(
        pa.scalar(_HEAD1), did, pa.scalar(_HEAD2), p1, pa.scalar(_MID),
        p2, pa.scalar(_TAIL), pa.scalar(""))
    return pa.table({"doc_id": batch.column("doc_id"), "html": html})


def _clean_text(col):
    """Strip residual tags, decode the common entities, collapse
    whitespace, trim — the block's visible text."""
    col = pc.replace_substring_regex(col, pattern=r"(?s)<[^>]+>",
                                     replacement="")
    for ent, rep in _ENTITIES:
        col = pc.replace_substring(col, pattern=ent, replacement=rep)
    col = pc.replace_substring_regex(col, pattern=r"\s+",
                                     replacement=" ")
    return pc.utf8_trim_whitespace(col)


def extract_main_content(batch: pa.Table) -> pa.Table:
    """(doc_id, html) → (doc_id, n_blocks, n_kept, words_kept,
    main_text): the boilerplate-strip operator.

    Pipeline per batch (all Arrow kernels): drop <script>/<style>
    elements → segment on block-tag closes → per fragment, bind the
    LAST opening block tag (greedy-prefix RE2 extract; head/tail
    fragments with no block tag drop out as nulls) → per block,
    visible text, word mass, and link density (chars removed when <a>
    elements are deleted ÷ all chars) → keep content-tag blocks
    (``KEEP_TAGS``) without a boilerplate class, with ≥ MIN_WORDS
    words and link density ≤ MAX_LINK_DENSITY → rejoin kept block
    texts per document with newlines."""
    n_rows = batch.num_rows
    if n_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_blocks": pa.array([], pa.int64()),
                         "n_kept": pa.array([], pa.int64()),
                         "words_kept": pa.array([], pa.int64()),
                         "main_text": pa.array([], pa.string())})
    h = batch.column("html")
    for t in ("script", "style"):
        h = pc.replace_substring_regex(
            h, pattern=rf"(?is)<{t}\b[^>]*>.*?</{t}>", replacement="")
    frags = pc.split_pattern_regex(h, pattern=_BLOCK_SPLIT) \
        .combine_chunks()
    flat = pc.list_flatten(frags)
    parent = pc.list_parent_indices(frags).to_numpy()
    ext = pc.extract_regex(flat, pattern=_BLOCK_OPEN)
    valid = pc.is_valid(ext).to_numpy(zero_copy_only=False)
    vmask = pa.array(valid)
    bparent = parent[valid]
    tag = pc.struct_field(ext, "tag").filter(vmask)
    attrs = pc.struct_field(ext, "attrs").filter(vmask)
    content = pc.struct_field(ext, "content").filter(vmask)

    no_anchor = pc.replace_substring_regex(
        content, pattern=r"(?is)<a\b[^>]*>.*?</a>", replacement="")
    text_all = _clean_text(content)
    len_all = pc.utf8_length(text_all).to_numpy().astype(np.float64)
    len_na = pc.utf8_length(_clean_text(no_anchor)).to_numpy()
    link_density = (len_all - len_na) / np.maximum(len_all, 1.0)
    words = pc.count_substring_regex(
        text_all, pattern=r"\S+").to_numpy().astype(np.int64)

    keep_tag = pc.is_in(tag, value_set=pa.array(KEEP_TAGS)).to_numpy(
        zero_copy_only=False)
    drop_cls = pc.match_substring_regex(
        attrs, pattern=_DROP_CLASS).to_numpy(zero_copy_only=False)
    keep = (keep_tag & ~drop_cls & (words >= MIN_WORDS)
            & (link_density <= MAX_LINK_DENSITY))

    n_blocks = np.bincount(bparent, minlength=n_rows).astype(np.int64)
    n_kept = np.bincount(bparent[keep],
                         minlength=n_rows).astype(np.int64)
    words_kept = np.zeros(n_rows, np.int64)
    np.add.at(words_kept, bparent[keep], words[keep])
    koff = np.zeros(n_rows + 1, np.int64)
    np.cumsum(n_kept, out=koff[1:])
    main = _join_lists(text_all.filter(pa.array(keep)), koff, "\n")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_blocks": pa.array(n_blocks),
                     "n_kept": pa.array(n_kept),
                     "words_kept": pa.array(words_kept),
                     "main_text": main})


# --- PII redaction ---------------------------------------------------
# RE2 patterns — identical semantics in Arrow and DuckDB (both RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"


def inject_pii(batch: pa.Table) -> pa.Table:
    """Deterministic PII augmentation of the corpus (pure function of
    (doc_id, text), mirrored arithmetic in the SQL oracle) so the
    redactor has non-vacuous work on the synthetic word-salad text."""
    d = batch.column("doc_id").to_numpy()
    m10 = pc.cast(pa.array(d % 10), pa.string())
    m5 = pc.cast(pa.array(d % 5), pa.string())
    m4 = pc.utf8_lpad(pc.cast(pa.array(d % 10000), pa.string()),
                      width=4, padding="0")
    did = pc.cast(batch.column("doc_id"), pa.string())
    aug = pc.binary_join_element_wise(
        batch.column("text"), pa.scalar(" Contact alice"), m10,
        pa.scalar("@example.com or https://site"), m5,
        pa.scalar(".example/page-"), did,
        pa.scalar(" or call +1-555-"), m4, pa.scalar("."),
        pa.scalar(""))
    return pa.table({"doc_id": batch.column("doc_id"), "text": aug})


def redact_pii(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → redaction counts + scrubbed text.

    Counts are taken on the input; replacement order is URL → EMAIL →
    PHONE (URLs first so an address embedded in a query string is
    scrubbed as part of its URL, never double-counted)."""
    text = batch.column("text")
    counts = {n: pc.count_substring_regex(text, pattern=p)
                  .cast(pa.int64())
              for n, p in (("n_urls", URL_RE), ("n_emails", EMAIL_RE),
                           ("n_phones", PHONE_RE))}
    clean = text
    for pat, rep in ((URL_RE, "<URL>"), (EMAIL_RE, "<EMAIL>"),
                     (PHONE_RE, "<PHONE>")):
        clean = pc.replace_substring_regex(clean, pattern=pat,
                                           replacement=rep)
    return pa.table({"doc_id": batch.column("doc_id"), **counts,
                     "clean_text": clean})
