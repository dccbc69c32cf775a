"""BPE tokenizer (bpe.py): the vectorized merge machinery vs a scalar
per-word reference implementation, the left-to-right non-overlap parity
rule, training tie-breaks, and the e2e operator."""

import collections

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def brute_apply_one(s, pair):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
            out.append(s[i] + s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def brute_train(word_freqs, n_merges):
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        cnt = collections.Counter()
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt or max(cnt.values()) < 2:
            break
        top = max(cnt.values())
        pair = min(p for p, c in cnt.items() if c == top)
        merges.append(pair)
        for w in seqs:
            seqs[w] = brute_apply_one(seqs[w], pair)
    return merges


def brute_counts(words, merges):
    out = []
    for w in words:
        s = list(w)
        for pair in merges:
            s = brute_apply_one(s, pair)
        out.append(len(s))
    return out


WORDS = [
    "aaa", "aaaa", "aaaaa", "abab", "ababab", "banana", "bandana",
    "aa", "a", "zqx", "the_quick", "0xdeadbeef"[2:], "loop", "pool",
    "loops", "looping", "ba", "ab", "bb", "abba",
]
FREQS = [5, 3, 2, 7, 1, 4, 2, 9, 1, 1, 3, 2, 6, 6, 5, 4, 8, 8, 2, 3]


def test_train_matches_bruteforce_incl_ties_and_runs():
    from searchengine_ray.bpe import train_bpe

    wf = dict(zip(WORDS, FREQS))
    for n in (1, 3, 10, 40):
        assert train_bpe(WORDS, np.array(FREQS), n) == brute_train(wf, n)


def test_apply_matches_bruteforce_on_unseen_words():
    """Apply the trained merges to words NOT in training (incl. pure
    runs, the parity-rule stress) and compare per-word counts."""
    from searchengine_ray.bpe import apply_bpe_counts, train_bpe

    merges = train_bpe(WORDS, np.array(FREQS), 40)
    assert len(merges) > 3
    unseen = ["aaaaaaa", "abababa", "bananarama", "qqqq", "x",
              "the_quick_brown", "ba" * 9, "_" * 6]
    got = apply_bpe_counts(unseen, merges)
    assert got.tolist() == brute_counts(unseen, merges)


def test_equal_pair_parity_rule_exact():
    """A run of k equal symbols merges floor(k/2) times leftmost-first —
    the exact SQL replace() scan-and-skip semantics the oracle relies on."""
    from searchengine_ray.bpe import apply_bpe_counts

    merges = [("a", "a")]
    got = apply_bpe_counts(["a", "aa", "aaa", "aaaa", "aaaaa"], merges)
    assert got.tolist() == [1, 1, 2, 2, 3]


def test_alphabet_guard():
    from searchengine_ray.bpe import train_bpe

    with pytest.raises(ValueError, match="outside"):
        train_bpe(["héllo"], np.array([1]), 5)


def test_bpe_token_counts_e2e(tmp_path):
    """e2e over a tmp corpus (ref_pct=100): per-doc counts equal the
    brute-force replay; zero/short-token docs still get rows."""
    import pyarrow.parquet as pq

    from searchengine_ray.analyze import TOKEN_RE
    from searchengine_ray.bpe import bpe_token_counts, train_bpe

    texts = ["", "banana banana bandana", "aaa aaaa abab!",
             "the loop pool loops; looping", "?;!"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = (
        bpe_token_counts(str(d), ref_pct=100, n_merges=20)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert len(out) == len(texts)
    assert (out.loc[[0, 4], ["n_tokens", "n_bpe_tokens"]] == 0).all().all()
    wf = collections.Counter()
    for tx in texts:
        wf.update(TOKEN_RE.findall(tx.lower()))
    merges = brute_train(dict(wf), 20)
    assert merges == train_bpe(
        sorted(wf), np.array([wf[w] for w in sorted(wf)]), 20
    )
    for did, tx in enumerate(texts):
        toks = TOKEN_RE.findall(tx.lower())
        assert out.loc[did, "n_tokens"] == len(toks)
        assert out.loc[did, "n_bpe_tokens"] == sum(brute_counts(toks, merges))
    # guard
    with pytest.raises(ValueError, match="max_words"):
        bpe_token_counts(str(d), ref_pct=100, max_words=2)
