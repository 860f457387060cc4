"""Round-10 tokenizer APPLY scale twins: the rank-heap BPE encoder
and the Aho-Corasick dictionary tagger must reproduce their literal
registry forms bit-for-bit (they register the SAME oracle, so a
divergence would be a correctness failure, not a perf story).

Layers: (1) fuzz the single-pass merge emulation against literal
``str.replace`` — the delimiter-sharing semantics the SQL chain has;
(2) fuzz the full heap encoder against the full replace chain;
(3) fuzz Aho-Corasick matching against per-term ``\\b`` regexes;
(4) row-for-row Spark parity of both twins at sf0.001.
"""

import random
import re

import pytest

from data_pipeline_001_spark.operators.text_analysis import (
    _AhoCorasick,
    _bpe_chain_pass,
    _bpe_encode_n_tokens,
)
from data_pipeline_001_spark.plans.queries_mlprep import (
    _BPE_MERGES,
    _TAG_KEYWORDS,
)

SF = "/root/testdata/sf0.001"


def _replace_pass(word_tokens, a, b):
    """Reference: the literal delimited-string single replace pass the
    SQL oracle performs for one rule."""
    s = " " + " ".join(word_tokens) + " "
    s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return s.split()


def _chain_ref(word, merges):
    """Reference: the whole chained-replace pipeline of the
    ``text_bpe_encode`` registry form (and its DuckDB oracle)."""
    s = " " + " ".join(word) + " "
    for a, b in merges:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return len(s.split())


def test_chain_pass_matches_string_replace_fuzz():
    rng = random.Random(10)
    alphabet = "thab"
    for _ in range(3000):
        toks = [rng.choice(alphabet) for _ in range(rng.randint(0, 10))]
        a, b = rng.choice(alphabet), rng.choice(alphabet)
        assert _bpe_chain_pass(toks, a, b) == _replace_pass(toks, a, b), (
            toks,
            a,
            b,
        )


def test_heap_encoder_matches_chain_fuzz():
    ranks = {p: i for i, p in enumerate(_BPE_MERGES)}
    rng = random.Random(11)
    alphabet = "theinaord"
    adversarial = [
        "banana",  # delimiter-shared adjacent repeat of (a, n)
        "ththth",  # alternating run of rule 0
        "erer",  # the documented one-fewer-merge residual case
        "anand",  # (a,n) twice then (an,d)
        "thethethe",  # composite rule (th,e) run
        "", "t", "and", "inthe", "errer",
    ]
    words = adversarial + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(3000)
    ]
    for w in words:
        got = _bpe_encode_n_tokens(w, _BPE_MERGES, ranks)
        want = _chain_ref(w, _BPE_MERGES)
        assert got == want, (w, got, want)


def test_aho_corasick_matches_boundary_regex_fuzz():
    terms = tuple(_TAG_KEYWORDS) + ("da", "a", "ata", "netword")
    ac = _AhoCorasick(terms)
    rng = random.Random(12)
    alphabet = "datamodel pricesystem_19 .x-"
    for _ in range(1500):
        text = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 60))
        )
        want = {
            t
            for t in terms
            if re.search(rf"\b{re.escape(t)}\b", text)
        }
        assert ac.matches(text) == want, text


@pytest.mark.slow
def test_bpe_twins_row_identical(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    lit = {
        tuple(r) for r in qs["text_bpe_encode"](spark, SF).collect()
    }
    udf = {
        tuple(r) for r in qs["text_bpe_encode_udf"](spark, SF).collect()
    }
    assert lit == udf


@pytest.mark.slow
def test_keyword_twins_row_identical(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    lit = {
        tuple(r) for r in qs["curation_keyword_tags"](spark, SF).collect()
    }
    ac = {
        tuple(r) for r in qs["curation_keyword_tags_ac"](spark, SF).collect()
    }
    assert lit == ac


def _greedy_ref(word, vocab):
    """Reference greedy longest-match: max-length vocab probe at each
    position — O(|vocab|) per position, the thing the trie avoids."""
    n = 0
    i = 0
    while i < len(word):
        best = max(
            (len(t) for t in vocab if word.startswith(t, i)), default=0
        )
        assert best > 0
        n += 1
        i += best
    return n


def test_vocab_trie_matches_bruteforce_greedy_fuzz():
    from data_pipeline_001_spark.operators.text_analysis import _VocabTrie
    from data_pipeline_001_spark.plans.queries_mlprep import _SUBWORD_VOCAB

    trie = _VocabTrie(_SUBWORD_VOCAB)
    rng = random.Random(13)
    alphabet = "theinaordsc"
    words = ["the", "theorist", "ingestion", "a", "", "zzzz"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        for _ in range(3000)
    ]
    for w in words:
        if not w:
            continue
        assert trie.n_tokens(w) == _greedy_ref(w, _SUBWORD_VOCAB), w


def test_vocab_trie_rejects_uncovered_char():
    from data_pipeline_001_spark.operators.text_analysis import _VocabTrie

    trie = _VocabTrie(("a", "b", "ab"))
    with pytest.raises(ValueError):
        trie.n_tokens("abc")


def test_bpe_merge_table_order_validated():
    """Round-11 advice: bpe_encode_ranked's heap replay is only
    equivalent to the chained oracle on a VALID ORDERED merge table
    (creators before users). An out-of-order table must raise at
    operator entry, not silently diverge."""
    from data_pipeline_001_spark.operators.text_analysis import (
        _validate_merge_order,
    )

    # valid: composite "th" created at 0, used at 1
    _validate_merge_order((("t", "h"), ("th", "e")))
    # invalid: rule 0 uses "th" before rule 1 creates it
    with pytest.raises(ValueError, match="valid ordered"):
        _validate_merge_order((("th", "e"), ("t", "h")))
    # invalid: a LATER duplicate creator of "ab" (rank 2) means the
    # user at rank 1 runs before the last creation — the heap replay
    # and the chain diverge, so ALL creators must precede every user
    with pytest.raises(ValueError, match="valid ordered"):
        _validate_merge_order((("a", "b"), ("ab", "x"), ("a", "b")))


def test_aho_corasick_rejects_nonword_term_edges():
    """Round-11 advice: the AC boundary check assumes every term
    starts/ends with an ASCII word char; punctuation-edged terms
    would diverge from the \\b-regex twin and must raise."""
    from data_pipeline_001_spark.operators.text_analysis import _AhoCorasick

    _AhoCorasick(("spark", "data_pipeline", "k8s"))  # fine
    for bad in ("-dash", "dash-", "", ".dot", "quo'"):
        with pytest.raises(ValueError):
            _AhoCorasick(("ok", bad))
