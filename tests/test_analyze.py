import numpy as np

from searchengine_ray.analyze import (
    STOPWORDS,
    analyze_batch,
    analyze_query_token,
    field_length,
    tokenize,
)


def test_tokenize_lowercase_wordchars():
    assert tokenize("Hello, World_2!") == ["hello", "world_2"]


def test_stopwords_occupy_positions():
    # "the" is position 0; "fast" is position 1 even though "the" is unindexed
    ab = analyze_batch(["the fast the fast"])
    assert ab.doc_lens[0] == 4  # doclen counts stopwords
    (i,) = np.flatnonzero(ab.term == "fast")
    assert ab.tf[i] == 2
    assert list(ab.positions[ab.pos_offsets[i] : ab.pos_offsets[i + 1]]) == [1, 3]
    assert "the" not in set(ab.term)


def test_field_length_counts_stopwords():
    assert field_length("the and of zebra") == 4


def test_query_token_analysis():
    assert analyze_query_token("The") == []  # stopword vanishes
    assert analyze_query_token("near-death") == ["near", "death"]
    assert analyze_query_token("HASH_MAP") == ["hash_map"]


def test_analyze_batch_groups():
    ab = analyze_batch(["bb aa bb", "aa cc"])
    got = {}
    for i in range(len(ab.term)):
        got[(int(ab.doc_index[i]), str(ab.term[i]))] = (
            int(ab.tf[i]),
            list(ab.positions[ab.pos_offsets[i] : ab.pos_offsets[i + 1]]),
        )
    assert got == {
        (0, "bb"): (2, [0, 2]),
        (0, "aa"): (1, [1]),
        (1, "aa"): (1, [0]),
        (1, "cc"): (1, [1]),
    }


def test_stopword_list_is_lucene_english():
    assert "the" in STOPWORDS and "with" in STOPWORDS and len(STOPWORDS) == 33
