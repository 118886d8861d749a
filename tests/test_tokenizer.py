"""Golden tests pinning byte-level tokenizer fidelity
(reference IndexBuilder.cpp:56-111, QueryProcessor.cpp:113-133)."""

from cs6913_web_search_engines_spark.functions import tokenizer as tk


def test_basic_split_and_lower():
    assert tk.doc_term_freqs("The cat, the HAT.") == {"the": 2, "cat": 1, "hat": 1}


def test_underscore_is_separator_in_docs():
    # '_' terminates words in the doc tokenizer (IndexBuilder.cpp:59)
    assert tk.doc_term_freqs("foo_bar") == {"foo": 1, "bar": 1}


def test_leading_non_alnum_dropped():
    # isalnum(word[0]) filter: words starting with a kept-but-non-alnum
    # byte are dropped entirely.  'ā' (0xC4 0x81) has no separator
    # bytes, so "āx" stays one word whose first byte is non-alnum.
    assert tk.doc_term_freqs("āx abc") == {"abc": 1}
    # '£' (0xC2 0xA3) by contrast is ALL separator bytes ('£' is in the
    # sep literal), so "£x" splits and leaves the kept word "x".
    assert tk.doc_term_freqs("£x abc") == {"x": 1, "abc": 1}
    # digits pass the filter
    assert tk.doc_term_freqs("42nd street") == {"42nd": 1, "street": 1}


def test_all_ascii_separators():
    text = "a:b;c,d.e[f]g{h}i(j)k<l>m+n-o=p*q&r^s%t$u#v@w!x~y`z"
    got = tk.doc_term_freqs(text)
    assert set(got) == set("abcdefghijklmnopqrstuvwxyz")


def test_multibyte_separator_bytes():
    # The C++ sep string holds multi-byte UTF-8 chars processed
    # byte-wise: every byte of '·' (0xC2 0xB7) is a separator byte, so
    # any char sharing those bytes splits too.
    assert tk.doc_term_freqs("dog·cat") == {"dog": 1, "cat": 1}
    # '：' (U+FF1A fullwidth colon, in the set) splits
    assert tk.doc_term_freqs("a：b") == {"a": 1, "b": 1}


def test_empty_and_separator_only():
    assert tk.doc_term_freqs("") == {}
    assert tk.doc_term_freqs(" ,.;:") == {}


def test_trailing_word_counted():
    # last word flushed even without trailing separator
    # (IndexBuilder.cpp:93-101)
    assert tk.doc_term_freqs("alpha beta") == {"alpha": 1, "beta": 1}


def test_query_tokenizer_no_lower_no_filter():
    # _splitQuery keeps case and applies no isalnum filter
    assert tk.split_query("Dog CAT") == ["Dog", "CAT"]


def test_query_tokenizer_hw3_underscore():
    assert tk.split_query("dog_cat", mode="hw3") == ["dog", "cat"]
    assert tk.split_query("dog_cat", mode="hw2") == ["dog_cat"]


def test_query_dedup_preserves_order():
    # documented deviation: duplicates deduped, first occurrence order
    assert tk.split_query("cat dog cat") == ["cat", "dog"]


def test_doc_tokens_order():
    assert tk.doc_tokens("b a b") == ["b", "a", "b"]
