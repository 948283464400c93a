import numpy as np
import pytest

from cross_modal_video_engine_tpu.utils.vocab import (
    Vocabulary, build_vocab, caption_to_ids, clean_str,
)
from cross_modal_video_engine_tpu.utils.text2vec import (
    AveWord2Vec, Bow2Vec, get_text_encoder,
)
from cross_modal_video_engine_tpu.io.bigfile import write_bigfile


def test_clean_str():
    assert clean_str("A man, RIDING a horse!!") == ["a", "man", "riding", "a", "horse"]
    assert clean_str("  hello-world_42 ") == ["hello", "world", "42"]
    assert clean_str("...") == []


def test_build_vocab_rnn_specials_and_threshold():
    caps = ["a dog runs", "a dog sits", "a cat"]
    vocab, counter = build_vocab(caps, text_style="rnn", threshold=2)
    # specials occupy ids 0..3
    assert vocab("<pad>") == 0 and vocab("<start>") == 1
    assert vocab("<end>") == 2 and vocab("<unk>") == 3
    assert "dog" in vocab.word2idx and "cat" not in vocab.word2idx
    # OOV falls back to <unk> for rnn style
    assert vocab("zebra") == vocab("<unk>")
    assert counter["a"] == 3


def test_build_vocab_bow_no_specials():
    caps = ["a dog runs", "a dog sits"]
    vocab, _ = build_vocab(caps, text_style="bow", threshold=2)
    assert "<pad>" not in vocab.word2idx
    assert vocab("a") == 0 and vocab("dog") == 1


def test_caption_to_ids():
    vocab, _ = build_vocab(["a dog runs"] * 4, text_style="rnn", threshold=2)
    ids = caption_to_ids(vocab, "A dog jumps")
    assert ids[0] == 1 and ids[-1] == 2          # <start> ... <end>
    assert ids[1] == vocab("a") and ids[3] == 3  # 'jumps' -> <unk>


def test_vocab_roundtrip(tmp_path):
    vocab, _ = build_vocab(["a dog runs"] * 4, text_style="rnn", threshold=2)
    p = str(tmp_path / "vocab.json")
    vocab.save(p)
    v2 = Vocabulary.load(p)
    assert v2.word2idx == vocab.word2idx


def test_bow2vec_counts_and_oov():
    vocab, _ = build_vocab(["a dog runs fast", "a dog sits down"],
                           text_style="bow", threshold=2)
    bow = Bow2Vec(vocab)
    v = bow.mapping("the dog and the dog")
    assert v is not None
    assert v[vocab("dog")] == 2.0
    assert bow.mapping("zebra lion") is None
    batch = bow.batch_mapping(["a dog", "zebra"])
    assert batch.shape == (2, len(vocab))
    assert batch[1].sum() == 0.0


def test_bow2vec_l2_norm():
    vocab, _ = build_vocab(["a dog runs", "a dog sits"], "bow", threshold=2)
    bow = Bow2Vec(vocab, l2_norm=True)
    v = bow.mapping("a dog")
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-6)


def test_ave_word2vec(tmp_path):
    d = str(tmp_path / "w2v")
    names = ["dog", "cat", "runs"]
    mat = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 2]], dtype=np.float32)
    write_bigfile(d, names, mat)
    w2v = AveWord2Vec(d)
    v = w2v.mapping("dog runs")
    np.testing.assert_allclose(v, [0.5, 0, 1.0])
    # multiplicity preserved
    v2 = w2v.mapping("dog dog runs!")
    np.testing.assert_allclose(v2, np.array([2, 0, 2], dtype=np.float32) / 3)
    assert w2v.mapping("zebra") is None


def test_get_text_encoder():
    assert get_text_encoder("bow") is Bow2Vec
    assert get_text_encoder("word2vec") is AveWord2Vec
    with pytest.raises(KeyError):
        get_text_encoder("nope")
