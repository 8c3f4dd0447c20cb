"""Text-analysis operators: langid on natural text, quality integers,
fingerprint edges."""

import pandas as pd

from swarm_ray.ops.text import Fingerprint, LangId, TokenStats, quality_batch


def test_langid_profile_on_natural_text():
    l = LangId()
    assert l.predict_profile("the quick brown fox and the lazy dog sing of things") == "en"
    assert l.predict_profile("der schnelle braune fuchs springt und die hunde schlafen nicht") == "de"
    assert l.predict_profile("le renard brun et rapide saute et les chiens dorment") == "fr"


def test_langid_markers_tiebreak_deterministic():
    l = LangId()
    # 'la' is both fr and es marker; tie → ascending language order ('es' < 'fr')
    assert l.predict_markers("la la la") == "es"
    assert l.predict_markers("xyzzy qwerty") == "und"


def test_quality_integer_scaling():
    df = pd.DataFrame({"doc_id": [1], "text": ["the cat of a hat"]})
    out = quality_batch(df)
    assert out["n_words"].iloc[0] == 5
    assert out["stop_count"].iloc[0] == 3  # the, of, a
    assert out["stop_ratio_milli"].iloc[0] == 600
    # chars=16, words=5 → word chars = 16-4 = 12 → 2400 milli
    assert out["mean_word_len_milli"].iloc[0] == 2400


def test_fingerprint_short_doc_fallback():
    fp = Fingerprint()
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["only three words", "a b c d e f g"]})
    out = fp(df)
    import hashlib
    assert out["fingerprint"].iloc[0] == hashlib.md5(b"only three words").hexdigest()
    assert len(out["fingerprint"].iloc[1]) == 32


def test_token_stats():
    ts = TokenStats()
    df = pd.DataFrame({"doc_id": [1], "text": ["ab ab cd, 12"]})
    out = ts(df)
    assert out["ws_tokens"].iloc[0] == 4
    assert out["distinct_tokens"].iloc[0] == 3
    # bpe-ish: ab, ab, cd, ',', 12
    assert out["bpeish_tokens"].iloc[0] == 5


def test_hash_tokenizer_deterministic_and_bounded():
    import hashlib
    import pandas as pd
    from swarm_ray.ops.text import HashTokenizer, TOKENIZE_VOCAB

    b = pd.DataFrame({"doc_id": [1, 2], "text": ["the cat sat", "the the"]})
    tk = HashTokenizer()
    out1 = tk(b.copy())                     # now an Arrow table
    out2 = HashTokenizer()(b.copy())
    assert out1["tokens"].to_pylist() == out2["tokens"].to_pylist()
    assert out1["n_tok"].to_pylist() == [3, 2]
    the_id = int(hashlib.md5(b"the").hexdigest()[:8], 16) % TOKENIZE_VOCAB
    assert out1["tokens"].to_pylist()[0][0] == the_id
    assert out1["tokens"].to_pylist()[1] == [the_id, the_id]
    assert all(0 <= t < TOKENIZE_VOCAB
               for toks in out1["tokens"].to_pylist() for t in toks)


def test_doc_split_deterministic_and_proportional(ray_session):
    from swarm_ray.ops.text import q_doc_split
    sf = "/root/testdata/sf0.01"
    a = q_doc_split(sf).to_pandas().sort_values(["split", "lang"]).reset_index(drop=True)
    b = q_doc_split(sf).to_pandas().sort_values(["split", "lang"]).reset_index(drop=True)
    assert a.equals(b)                                  # reproducible
    by_split = a.groupby("split")["n_docs"].sum()
    total = by_split.sum()
    assert set(by_split.index) == {"train", "val", "test"}
    assert 0.7 < by_split["train"] / total < 0.9        # ~80/10/10
    assert by_split["val"] + by_split["test"] < 0.3 * total
